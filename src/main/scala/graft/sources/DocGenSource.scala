package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic-corpus generator: `spark.read
  * .format("graftdocs").option("rows", n).option("partitions", p)` —
  * a documents-shaped table materialized from arithmetic, no disk.
  *
  * Why an engine needs it at 100 TB: shaking out a pipeline's shuffle /
  * skew / memory behavior at target scale should not require staging
  * 100 TB of parquet first. A generated source produces any row count
  * with zero IO, deterministically (same seed ⇒ same corpus on any
  * cluster size — partition boundaries never change values).
  *
  * The V2 surface exercised: TableProvider → Table(SupportsRead) →
  * ScanBuilder(SupportsPushDownRequiredColumns) → Scan → Batch →
  * InputPartition → PartitionReaderFactory → PartitionReader.
  * Column pruning is REAL here: the reader only synthesizes requested
  * fields, so `select(doc_id)` never pays text generation — the same
  * contract a parquet scan honours with ReadSchema, observable in the
  * BatchScanExec's pruned output (spec-asserted).
  *
  * Row semantics mirror /root/testdata's documents table: (doc_id,
  * text, lang, source, n_chars); text is seeded word-soup with
  * occasional near-duplicates (every 100th doc repeats doc 7's words
  * with one substitution) so dedup operators have work to do.
  */
class DocGenProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftdocs"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocGen.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new DocGenTable(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      parts = Option(properties.get("partitions")).map(_.toInt).getOrElse(8),
      seed = Option(properties.get("seed")).map(_.toLong).getOrElse(42L))
}

private[sources] class DocGenTable(rows: Long, parts: Int, seed: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graftdocs(rows=$rows, seed=$seed)"
  override def schema(): StructType = DocGen.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocGenScanBuilder(rows, parts, seed)
}

private[sources] class DocGenScanBuilder(rows: Long, parts: Int, seed: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = DocGen.schema
  private var lo = 0L          // inclusive doc_id lower bound
  private var hi = Long.MaxValue // exclusive doc_id upper bound
  private var residues: Option[Set[Int]] = None // doc_id % 20 classes to keep
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve our canonical field order; Spark may request any order
    required = StructType(
      DocGen.schema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  /** doc_id range predicates tighten the generated id interval itself —
    * the generator never produces (let alone filters) pruned ids, the
    * exact analog of parquet row-group pruning on a sorted key.
    * `source = 'srcK'` / `source IN (...)` equality predicates translate
    * to doc_id residue classes mod 20 (source is purely id-derived), so
    * the reader strides over matching ids only — the analog of
    * partition pruning on a derived partition column. Both are EXACT, so
    * the filters are absorbed (not returned as residual) and Spark never
    * re-evaluates them. Other filters are left for Spark post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def srcResidue(v: Any): Option[Int] = v match {
      case s: String if s.startsWith("src") =>
        s.drop(3).toIntOption.filter(k => k >= 0 && k < 20)
      case _ => None
    }
    val (accepted, rest) = filters.partition {
      case GreaterThan("doc_id", _: Long) => true
      case GreaterThanOrEqual("doc_id", _: Long) => true
      case LessThan("doc_id", _: Long) => true
      case LessThanOrEqual("doc_id", _: Long) => true
      case EqualTo("source", _) => true
      case In("source", _) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("source", v) =>
        val r = srcResidue(v).toSet
        residues = Some(residues.fold(r)(_ intersect r))
      case In("source", vs) =>
        val r = vs.flatMap(srcResidue).toSet
        residues = Some(residues.fold(r)(_ intersect r))
      case _ =>
    }
    pushed = accepted
    rest // residual filters Spark still applies
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new DocGenScan(rows, parts, seed, required, lo, hi, residues)
}

private[sources] class DocGenScan(rows: Long, parts: Int, seed: Long,
    required: StructType, lo: Long = 0L, hi: Long = Long.MaxValue,
    residues: Option[Set[Int]] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graftdocs rows=$rows cols=[${required.fieldNames.mkString(",")}]" +
      (if (lo > 0 || hi < rows) s" ids=[$lo,${math.min(hi, rows)})" else "") +
      residues.fold("")(r => s" sources%20=${r.toSeq.sorted.mkString("{", ",", "}")}")

  override def planInputPartitions(): Array[InputPartition] = {
    val begin = math.max(0L, lo)
    val stop = math.min(rows, hi)
    if (begin >= stop || residues.exists(_.isEmpty))
      return Array.empty
    val span = stop - begin
    // residue pruning keeps |residues|/20 of the ids: plan
    // proportionally FEWER, WIDER partitions so each carries the same
    // generated-row workload — a selective `source =` filter plans a
    // smaller scan (the partition-pruning analog), not `parts`
    // near-empty readers each paying task overhead for span/20 rows.
    val keepClasses = residues.map(_.size).getOrElse(20)
    val effParts = math.max(1L, (parts.toLong * keepClasses + 19) / 20)
    val per = math.max(1L, (span + effParts - 1) / effParts)
    (begin until stop by per)
      .map(start => DocGenPartition(start, math.min(start + per, stop)))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(seed, required.fieldNames, residues)
}

/** Generated id interval [start, end) — public so tests and tooling can
  * inspect how pushdown shaped the scan. */
case class DocGenPartition(start: Long, end: Long) extends InputPartition

private[sources] class DocGenReaderFactory(seed: Long, cols: Array[String],
    residues: Option[Set[Int]] = None)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val dp = p.asInstanceOf[DocGenPartition]
    new DocGenReader(dp.start, dp.end, seed, cols, residues)
  }
}

private[sources] class DocGenReader(start: Long, end: Long, seed: Long,
    cols: Array[String], residues: Option[Set[Int]] = None)
    extends PartitionReader[InternalRow] {
  private var i = start - 1
  private val row = new GenericInternalRow(cols.length)
  private val needText = cols.exists(c => c == "text" || c == "n_chars")

  override def next(): Boolean = {
    i += 1
    // residue-class stride (pushed `source =` filters): matching ids are
    // visited directly; pruned ids never pay text synthesis
    residues.foreach { rs =>
      while (i < end && !rs.contains(Math.floorMod(i, 20L).toInt)) i += 1
    }
    i < end
  }

  override def get(): InternalRow = {
    // generation depends ONLY on (seed, doc_id) — never on partition
    // boundaries, so any `partitions` setting yields the same corpus
    val text = if (needText) DocGen.text(seed, i) else null
    var c = 0
    while (c < cols.length) {
      row.update(c, cols(c) match {
        case "doc_id" => i
        case "text" => UTF8String.fromString(text)
        case "lang" => UTF8String.fromString(DocGen.lang(seed, i))
        case "source" => UTF8String.fromString("src" + (i % 20))
        case "n_chars" => text.length.toLong
      })
      c += 1
    }
    row
  }

  override def close(): Unit = ()
}

/** Deterministic generation kernel (shared by reader and specs). */
object DocGen {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private[graft] val words = Array("the", "a", "data", "table", "row", "scan",
    "join", "agg", "key", "value", "fast", "slow", "batch", "stream",
    "spark", "query", "filter", "group", "window", "hash", "merge",
    "sort", "part", "small", "big", "line", "order", "customer",
    "vector", "column")
  private val langs = Array("en", "de", "fr", "es")

  /** splitmix64 — stateless, high-quality 64-bit mix. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def lang(seed: Long, id: Long): String =
    langs(Math.floorMod(mix(seed ^ (id * 31 + 7)) >>> 33,
      langs.length.toLong).toInt)

  def text(seed: Long, id: Long): String = {
    // every 100th doc is a near-duplicate of doc 7 (one word swapped)
    val base = if (id % 100 == 99) 7L else id
    val h0 = mix(seed ^ base)
    val n = 30 + (Math.floorMod(h0, 50L)).toInt
    val sb = new java.lang.StringBuilder(n * 6)
    var k = 0
    var h = h0
    while (k < n) {
      if (k > 0) sb.append(' ')
      h = mix(h)
      sb.append(words(Math.floorMod(h, words.length.toLong).toInt))
      k += 1
    }
    if (id % 100 == 99) sb.append(" variant").append(Math.floorMod(id, 9))
    sb.toString
  }
}
