package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DataSource V2 generated-corpus source: determinism across partition
  * layouts, real column pruning, and enough duplicate structure for
  * dedup operators to exercise against it. */
class DocGenSourceSpec extends SparkSpec {
  import spark.implicits._

  private def gen(rows: Long, parts: Int) =
    spark.read.format("graftdocs")
      .option("rows", rows).option("partitions", parts).load()

  test("row count, schema, and short-name registration") {
    val df = gen(1000, 8)
    assert(df.count() === 1000L)
    assert(df.schema.fieldNames.toSeq ===
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(df.select(countDistinct($"doc_id")).head.getLong(0) === 1000L)
  }

  test("values are identical for ANY partition count (seed-pure generation)") {
    val a = gen(500, 3).orderBy($"doc_id").collect()
    val b = gen(500, 16).orderBy($"doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("column pruning reaches the scan (select(doc_id) never builds text)") {
    val pruned = gen(100, 2).select($"doc_id", $"lang")
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("doc_id", "lang"))
  }

  test("doc_id range filters push into partition planning (generated-scan pruning)") {
    val df = gen(10000, 10).filter($"doc_id" >= 2500 && $"doc_id" < 3500)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec"))
    // the scan only covers the requested id interval: input partitions
    // span 1000 ids, not 10000 (the generator never produces pruned ids)
    val parts = scan.batch.planInputPartitions()
    val spanned = parts.map { p =>
      val d = p.asInstanceOf[graft.sources.DocGenPartition]
      d.end - d.start
    }.sum
    assert(spanned === 1000L, s"scan spans $spanned ids")
    assert(df.count() === 1000L)
    // values are unchanged by pushdown (same rows as post-filtering)
    val viaFull = gen(10000, 10).orderBy($"doc_id").collect()
      .filter(r => r.getLong(0) >= 2500 && r.getLong(0) < 3500)
    assert(df.orderBy($"doc_id").collect().toSeq === viaFull.toSeq)
  }

  test("contradictory pushed range yields an empty scan, not an error") {
    val df = gen(1000, 4).filter($"doc_id" > 800 && $"doc_id" < 100)
    assert(df.count() === 0L)
  }

  test("source equality pushes as a residue-class stride (derived-partition pruning)") {
    val df = gen(2000, 4).filter($"source" === "src5")
    // the filter is absorbed by the source: no Spark-side Filter node
    // re-evaluates it
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter ("), s"absorbed filter must not reappear:\n$plan")
    assert(df.count() === 100L) // ids ≡ 5 (mod 20) in [0, 2000)
    assert(df.select("doc_id").collect().forall(_.getLong(0) % 20 == 5))
    // values identical to post-filtering the full corpus
    val viaFull = gen(2000, 4).collect().filter(_.getString(3) == "src5")
    assert(df.orderBy($"doc_id").collect().toSeq ===
      viaFull.sortBy(_.getLong(0)).toSeq)
  }

  test("source IN pushes the residue union; unknown source yields empty scan") {
    val in = gen(2000, 4).filter($"source".isin("src0", "src19", "nope"))
    assert(in.count() === 200L)
    val none = gen(2000, 4).filter($"source" === "other")
    assert(none.queryExecution.executedPlan.toString.contains("BatchScan") ||
      none.count() === 0L)
    assert(none.count() === 0L)
    // composes with doc_id ranges: intersected pruning
    val both = gen(2000, 4)
      .filter($"source" === "src5" && $"doc_id" >= 1000L)
    assert(both.count() === 50L)
    assert(both.collect().forall(r => r.getLong(0) % 20 == 5 && r.getLong(0) >= 1000))
  }

  test("source filters plan FEWER InputPartitions (partition-level " +
      "pruning, not just a reader stride)") {
    def nParts(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b
      }.getOrElse(fail("no BatchScanExec")).batch.planInputPartitions().length
    assert(nParts(gen(20000, 8)) === 8)
    // one residue class of 20 → ceil(8/20) = 1 partition, same rows
    val one = gen(20000, 8).filter($"source" === "src5")
    assert(nParts(one) === 1)
    assert(one.count() === 1000L)
    // ten classes → ceil(8·10/20) = 4 partitions
    val ten = gen(20000, 8).filter($"source".isin(
      (0 until 10).map("src" + _): _*))
    assert(nParts(ten) === 4)
    assert(ten.count() === 10000L)
    // pruning never changes values
    assert(one.orderBy($"doc_id").collect().toSeq ===
      gen(20000, 8).collect().filter(_.getString(3) == "src5")
        .sortBy(_.getLong(0)).toSeq)
  }

  test("n_chars matches text length; near-dups exist for dedup ops") {
    val df = gen(1000, 4).cache()
    try {
      assert(df.filter(length($"text") =!= $"n_chars").isEmpty)
      // every 100th doc shares doc 7's word prefix => LSH/exact-prefix
      // dedup has real clusters to find
      val nearDupes = df.filter($"doc_id" % 100 === 99)
        .select(substring($"text", 1, 20).as("head")).distinct().count()
      assert(nearDupes === 1L)
    } finally df.unpersist()
  }

  test("the generated table drives the library operators end-to-end") {
    val docs = gen(2000, 8)
    val groups = graft.ext.TextDedup.exactGroups(docs, "text", "doc_id")
    // generation is injective on the non-clone ids, clones collide
    assert(groups.filter($"n_copies" > 1).count() >= 1)
  }
}
