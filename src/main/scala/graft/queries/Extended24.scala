package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Exact
import graft.functions.TextFns

/** Round-14 batch (q232–q237): corpus-composition read-outs a
  * training-data curation pipeline runs between dedup and packing —
  * concentration, collocation, richness, provenance, chunking, and
  * dispersion. Every read-out is exact integer (ppm/milli/micro by
  * integer division, nano-floored logs per the q178/q220 discipline),
  * with the n²-magnitude folds in DECIMAL(38,0) via [[graft.ext.Exact]]
  * from day one — no 64-bit scale cap to retrofit later.
  *
  *  - q232 exact Gini of document lengths over the whole corpus via
  *    the two-pass [[graft.operators.GlobalRank]] (the sorted-rank
  *    identity needs a GLOBAL rank — the single-task window the rank
  *    operator exists to avoid);
  *  - q233 PMI collocations (top 20) from exact bigram/unigram counts;
  *  - q234 Chao1 vocabulary-richness estimate per source (the
  *    "how much vocabulary haven't we sampled yet" dial);
  *  - q235 cross-source exact-duplication matrix (provenance: which
  *    source pairs share verbatim content, keyed by content hash);
  *  - q236 sliding-window chunking (64-token windows, stride 48) —
  *    the retrieval-indexing transform, read out as per-source
  *    chunk/token accounting including the overlap overhead;
  *  - q237 token burstiness (variance-to-mean ratio, Church–Gale
  *    style): topical tokens are bursty, function words uniform.
  */
object Extended24 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------------
  // q232 — exact Gini concentration of document lengths, integer ppm:
  // gini = (2·Σ rk·x − (n+1)·Σx) / (n·Σx) over ascending-sorted x.
  // The global rank comes from GlobalRank.withRank (range-partition +
  // per-partition offsets — no single-task window); the Σ rk·x fold
  // is rank-sensitive, so it certifies every rank like q155's dot
  // product. Products run in DECIMAL(38,0): rk·x is n·x-magnitude and
  // the fold n²·x — a 64-bit Gini caps out near 10⁹ docs.
  def q232(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ranked = graft.operators.GlobalRank.withRank(
      t(s, dir, "documents").select($"doc_id", $"n_chars"),
      Seq($"n_chars", $"doc_id"), rankCol = "rank")
    ranked
      .agg(count(lit(1)).as("n"),
        sum($"n_chars".cast("long")).as("total_chars"),
        Exact.decSum(Exact.dec($"rank") * $"n_chars").as("w"))
      .select($"n", $"total_chars",
        expr(s"((2 * w - (CAST(n AS ${Exact.Dec}) + 1) * total_chars)" +
          " * 1000000) div (CAST(n AS " + Exact.Dec + ") * total_chars)")
          .as("gini_ppm"))
  }

  val q232Sql: String =
    """WITH r AS (SELECT CAST(n_chars AS BIGINT) AS x,
      |  row_number() OVER (ORDER BY n_chars, doc_id) AS rk
      |  FROM documents)
      |SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS total_chars,
      |  CAST(((2 * sum(rk * x) - (count(*) + 1) * sum(x)) * 1000000)
      |    // (count(*) * sum(x)) AS BIGINT) AS gini_ppm
      |FROM r""".stripMargin

  // --------------------------------------------------------------------
  // q233 — top-20 PMI collocations: pmi(a,b) = ln(c_ab·T² / (N·c_a·c_b))
  // from exact adjacent-bigram counts c_ab (N total), unigram counts
  // c (T total). The log argument is a ratio of exact counts built by
  // ONE shared expression shape, nano-floored per bigram BEFORE the
  // ordering (the q220 discipline), so the top-20 cut is
  // deterministic on both engines (ties broken by the bigram itself).
  // Two shuffles (bigram count, unigram count) + a broadcast-size
  // totals cross join.
  private val PmiMinCount = 5

  def q233(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // `toks` feeds THREE subtrees (bigram counts, unigram counts, and
    // the totals over both): without pinning, the tokenize+explode
    // pipeline executes per reference — ReuseExchange dedups only the
    // identical `uni` shuffle, not the differently-shaped scans. At
    // 100 TB tokenization is the dominant cost; one localCheckpoint
    // (the q153/q201 precedent) makes it a single pass.
    val toks = t(s, dir, "documents")
      .select(TextFns.tokens($"text").as("ts"))
      .select($"ts", size($"ts").as("nt"))
      .localCheckpoint()
    val bi = toks.filter($"nt" >= 2)
      .select(explode(expr("transform(sequence(1, nt - 1)," +
        " i -> struct(element_at(ts, i) AS a," +
        " element_at(ts, i + 1) AS b))")).as("p"))
      .groupBy($"p.a".as("a"), $"p.b".as("b"))
      .agg(count(lit(1)).as("cab"))
    val uni = toks.select(explode($"ts").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val totals = uni.agg(sum($"c").as("T"))
      .crossJoin(bi.agg(sum($"cab").as("N")))
    bi.filter($"cab" >= PmiMinCount)
      .join(uni.select($"w".as("a"), $"c".as("ca")), "a")
      .join(uni.select($"w".as("b"), $"c".as("cb")), "b")
      .crossJoin(totals)
      .select($"a", $"b", $"cab",
        expr("CAST(floor(ln((CAST(cab AS DOUBLE) * T * T) /" +
          " ((CAST(N AS DOUBLE) * ca) * cb)) * 1000000000.0 + 0.5)" +
          " AS BIGINT)").as("pmi_nano"))
      .orderBy($"pmi_nano".desc, $"a", $"b")
      .limit(20)
  }

  val q233Sql: String =
    s"""WITH tk AS (SELECT ${DocOps.tokensSql} AS ts FROM documents),
       | bi0 AS (SELECT unnest(list_transform(
       |     generate_series(1, len(ts) - 1),
       |     i -> struct_pack(a := ts[i], b := ts[i + 1]))) AS p
       |   FROM tk WHERE len(ts) >= 2),
       | bi AS (SELECT p.a AS a, p.b AS b, count(*) AS cab
       |        FROM bi0 GROUP BY 1, 2),
       | uni AS (SELECT w, count(*) AS c
       |         FROM (SELECT unnest(ts) AS w FROM tk) GROUP BY 1),
       | tot AS (SELECT CAST(sum(c) AS BIGINT) AS T FROM uni),
       | nn AS (SELECT CAST(sum(cab) AS BIGINT) AS N FROM bi)
       |SELECT a, b, CAST(cab AS BIGINT) AS cab,
       |  CAST(floor(ln((CAST(cab AS DOUBLE) * T * T) /
       |    ((CAST(N AS DOUBLE) * ca) * cb)) * 1000000000.0 + 0.5)
       |    AS BIGINT) AS pmi_nano
       |FROM bi
       |JOIN (SELECT w AS a, c AS ca FROM uni) USING (a)
       |JOIN (SELECT w AS b, c AS cb FROM uni) USING (b)
       |CROSS JOIN tot CROSS JOIN nn
       |WHERE cab >= $PmiMinCount
       |ORDER BY pmi_nano DESC, a, b LIMIT 20""".stripMargin

  // --------------------------------------------------------------------
  // q234 — Chao1 richness per source: S_obs + f1(f1−1)/(2(f2+1)) from
  // the hapax (f1) and dis legomenon (f2) counts — the standard
  // lower-bound estimate of UNSEEN vocabulary, exact in milli units
  // by integer division. One (source, word) count shuffle, then a
  // 3-way conditional fold per source.
  def q234(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    chao1Fold(t(s, dir, "documents")).orderBy($"source")
  }

  /** The q234 fold, frame-parameterized so Extended24Spec's hand
    * values pin the PRODUCTION expressions (a copy would let a
    * symmetric Spark+oracle edit slip past both gates). */
  private[graft] def chao1Fold(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(TextFns.tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("s_obs"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("source"), col("s_obs"), col("f1"), col("f2"),
        expr(s"s_obs * 1000 + (CAST(f1 AS ${Exact.Dec}) * (f1 - 1)" +
          " * 1000) div (2 * (f2 + 1))").as("chao1_milli"))

  val q234Sql: String =
    s"""WITH wc AS (SELECT source, w, count(*) AS c
       |  FROM (SELECT source, unnest(${DocOps.tokensSql}) AS w
       |        FROM documents)
       |  GROUP BY 1, 2),
       | f AS (SELECT source, count(*) AS s_obs,
       |   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       |   CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
       |   FROM wc GROUP BY 1)
       |SELECT source, s_obs, f1, f2,
       |  CAST(s_obs * 1000 + (f1 * (f1 - 1) * 1000) // (2 * (f2 + 1))
       |    AS BIGINT) AS chao1_milli
       |FROM f ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // q235 — cross-source duplication matrix over OPENING fingerprints
  // (md5 of the first 8 tokens): for every source pair, how many
  // distinct openings occur in BOTH — the provenance read-out that
  // tells a curator which feeds share boilerplate/templated content
  // (verbatim-full-text overlap is the degenerate case; openings
  // catch the re-wrapped copies full-text hashing misses). Scale
  // shape: the (fingerprint, source) frame is distinct (≤ corpus),
  // the self-join key is the fingerprint whose per-key fan-out is
  // bounded by #sources — candidate volume ≤ C(#sources, 2) per
  // fingerprint, linear overall. Inner semantics: pairs sharing
  // nothing drop out on both engines.
  private val FpTokens = 8

  def q235(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hs = t(s, dir, "documents")
      .select(md5(array_join(
        slice(TextFns.tokens($"text"), 1, FpTokens), " ")).as("h"),
        $"source").distinct()
    hs.as("a").join(hs.as("b"),
        $"a.h" === $"b.h" && $"a.source" < $"b.source")
      .groupBy($"a.source".as("source_a"), $"b.source".as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy($"source_a", $"source_b")
  }

  val q235Sql: String =
    s"""WITH hs AS (SELECT DISTINCT md5(array_to_string(
       |    list_slice(${DocOps.tokensSql}, 1, $FpTokens), ' ')) AS h,
       |    source FROM documents)
       |SELECT a.source AS source_a, b.source AS source_b,
       |       count(*) AS n_shared
       |FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
       |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin

  // --------------------------------------------------------------------
  // q236 — sliding-window chunking (window 64 tokens, stride 48): the
  // retrieval-indexing transform, read out as per-source accounting —
  // n_chunks, Σ chunk tokens (so sum_chunk_tokens − n_tokens IS the
  // overlap overhead a storage planner budgets for). Chunk starts are
  // a per-row generated sequence (no shuffle beyond the final
  // per-source fold); every doc yields ≥ 1 chunk.
  private val ChunkWin = 64
  private val ChunkStride = 48

  def q236(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .select($"source", size(TextFns.tokens($"text")).as("nt"))
      .filter($"nt" >= 1)
    val perDoc = d.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"nt".cast("long")).as("n_tokens"))
    perDoc.join(chunkFold(d), "source")
      .select($"source", $"n_docs", $"n_tokens", $"n_chunks",
        $"sum_chunk_tokens")
      .orderBy($"source")
  }

  /** The q236 chunk accounting over a (source, nt) frame — the
    * PRODUCTION expressions Extended24Spec's boundary cases pin
    * (nt 64/65/5/160 against [[ChunkWin]]/[[ChunkStride]]). */
  private[graft] def chunkFold(d: DataFrame): DataFrame =
    d.select(col("source"), col("nt"),
        explode(expr(s"transform(sequence(0," +
          s" (greatest(nt - $ChunkWin, 0) + ${ChunkStride - 1}) div $ChunkStride)," +
          s" j -> 1 + $ChunkStride * j)")).as("start"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(least(lit(ChunkWin.toLong), col("nt") - col("start") + 1))
          .as("sum_chunk_tokens"))

  val q236Sql: String =
    s"""WITH d AS (SELECT source, len(${DocOps.tokensSql}) AS nt
       |  FROM documents),
       | d1 AS (SELECT * FROM d WHERE nt >= 1),
       | pd AS (SELECT source, count(*) AS n_docs,
       |          CAST(sum(nt) AS BIGINT) AS n_tokens
       |        FROM d1 GROUP BY 1),
       | ch AS (SELECT source, nt, unnest(list_transform(
       |     generate_series(0, (greatest(nt - $ChunkWin, 0) + ${ChunkStride - 1}) // $ChunkStride),
       |     j -> 1 + $ChunkStride * j)) AS start FROM d1),
       | ca AS (SELECT source, count(*) AS n_chunks,
       |          CAST(sum(least($ChunkWin, nt - start + 1)) AS BIGINT)
       |            AS sum_chunk_tokens
       |        FROM ch GROUP BY 1)
       |SELECT source, n_docs, n_tokens, n_chunks, sum_chunk_tokens
       |FROM pd JOIN ca USING (source) ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // q237 — token burstiness (variance-to-mean ratio over per-doc
  // counts, zeros included): VMR = (n·Σc² − S²) / (n·S) with
  // S = Σ_docs c, Q = Σ_docs c² — topical tokens read ≫ 1, function
  // words ≈ 1 (Church–Gale). Exact integer micro read-out; the n·Q
  // and S² terms run in DECIMAL(38,0). Top 15 by total count with the
  // token as tie-break. One (doc, word) count shuffle + one word fold.
  private val BurstMinCount = 50

  def q237(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    burstinessFold(t(s, dir, "documents"), BurstMinCount)
      .orderBy($"total".desc, $"w")
      .limit(15)
  }

  /** The q237 VMR fold — the PRODUCTION expressions Extended24Spec's
    * concentrated-vs-uniform hand values pin. */
  private[graft] def burstinessFold(docs: DataFrame,
      minCount: Int): DataFrame = {
    val perDoc = docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    perDoc.groupBy(col("w"))
      .agg(sum(col("c")).as("s"),
        Exact.decSum(Exact.dec(col("c")) * col("c")).as("q"))
      .filter(col("s") >= minCount)
      .crossJoin(nDocs)
      .select(col("w"), col("s").as("total"),
        expr(s"((CAST(n AS ${Exact.Dec}) * q - CAST(s AS ${Exact.Dec})" +
          s" * s) * 1000000) div (CAST(n AS ${Exact.Dec}) * s)")
          .as("vmr_micro"))
  }

  val q237Sql: String =
    s"""WITH pd AS (SELECT doc_id, w, count(*) AS c
       |  FROM (SELECT doc_id, unnest(${DocOps.tokensSql}) AS w
       |        FROM documents)
       |  GROUP BY 1, 2),
       | nd AS (SELECT count(*) AS n FROM documents),
       | wf AS (SELECT w, CAST(sum(c) AS BIGINT) AS s,
       |          CAST(sum(c * c) AS BIGINT) AS q
       |        FROM pd GROUP BY 1)
       |SELECT w, s AS total,
       |  CAST(((n * q - s * s) * 1000000) // (n * s) AS BIGINT)
       |    AS vmr_micro
       |FROM wf CROSS JOIN nd
       |WHERE s >= $BurstMinCount
       |ORDER BY total DESC, w LIMIT 15""".stripMargin

  /** Name → query, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q232_length_gini" -> (q232 _),
    "q233_pmi_collocations" -> (q233 _),
    "q234_chao1_richness" -> (q234 _),
    "q235_source_dup_matrix" -> (q235 _),
    "q236_sliding_chunks" -> (q236 _),
    "q237_token_burstiness" -> (q237 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q232_length_gini" -> q232Sql,
    "q233_pmi_collocations" -> q233Sql,
    "q234_chao1_richness" -> q234Sql,
    "q235_source_dup_matrix" -> q235Sql,
    "q236_sliding_chunks" -> q236Sql,
    "q237_token_burstiness" -> q237Sql
  )
}
