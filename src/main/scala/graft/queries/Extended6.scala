package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Round-7 third batch: corpus-curation OBSERVABILITY operators — the
  * reports a data team runs daily over a 100 TB corpus:
  *
  *  - q126 quality-filter cascade attrition (how many docs survive each
  *    cumulative filter stage — the funnel of the cleaning pipeline);
  *  - q127 dedup cluster-size histogram (the shape of duplication:
  *    how many pairs/triples/mega-clusters);
  *  - q128 cross-source contamination matrix (which sources share
  *    verbatim 5-gram content — grouped expansion, never a self-join);
  *  - q129 nucleus (top-p) selection per source (keep highest-mass docs
  *    covering 80% of char mass — integer cross-multiplied, no floats).
  *
  * All discrete/integer outputs: nothing in this file computes a float,
  * so cross-engine parity is structural.
  */
object Extended6 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------------
  // q126 — filter-cascade attrition: four cumulative quality gates
  // (min chars → min tokens → mean word length band → target lang),
  // counted in ONE scan with conditional aggregation, then unpivoted to
  // a per-stage funnel via stack(). Word-length band avoids a float
  // division: 3·n ≤ total_token_chars ≤ 12·n cross-multiplied.
  def q126(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .withColumn("toks", TextFns.tokens($"text"))
      .withColumn("n_toks", size($"toks").cast("long"))
      .withColumn("tok_chars", length(array_join($"toks", "")).cast("long"))
    val c1 = $"n_chars" >= 100
    val c2 = c1 && $"n_toks" >= 20
    val c3 = c2 && $"tok_chars" >= $"n_toks" * 3 && $"tok_chars" <= $"n_toks" * 12
    val c4 = c3 && $"lang" === "en"
    d.agg(
        count(lit(1)).as("total"),
        count(when(c1, 1)).as("s1"), count(when(c2, 1)).as("s2"),
        count(when(c3, 1)).as("s3"), count(when(c4, 1)).as("s4"))
      .select(expr(
        """stack(4,
          | 1, 'min_chars',  s1,
          | 2, 'min_tokens', s2,
          | 3, 'word_len',   s3,
          | 4, 'lang_en',    s4) AS (stage, filter, n_pass)""".stripMargin),
        $"total")
      .select($"stage", $"filter", $"n_pass",
        expr("n_pass * 1000000 div total").as("pass_ppm"))
      .orderBy($"stage")
  }

  val q126Sql: String = {
    val toks = DocOps.tokensSql
    """WITH d AS (
      |  SELECT n_chars, lang,
      |         CAST(len(TOKS) AS BIGINT) AS n_toks,
      |         CAST(len(array_to_string(TOKS, '')) AS BIGINT) AS tok_chars
      |  FROM documents),
      |agg AS (
      |  SELECT count(*) AS total,
      |    count(*) FILTER (n_chars >= 100) AS s1,
      |    count(*) FILTER (n_chars >= 100 AND n_toks >= 20) AS s2,
      |    count(*) FILTER (n_chars >= 100 AND n_toks >= 20
      |      AND tok_chars >= n_toks * 3 AND tok_chars <= n_toks * 12) AS s3,
      |    count(*) FILTER (n_chars >= 100 AND n_toks >= 20
      |      AND tok_chars >= n_toks * 3 AND tok_chars <= n_toks * 12
      |      AND lang = 'en') AS s4
      |  FROM d)
      |SELECT stage, filter, n_pass,
      |       CAST(n_pass * 1000000 // total AS BIGINT) AS pass_ppm
      |FROM (
      |  SELECT 1 AS stage, 'min_chars' AS filter, s1 AS n_pass, total FROM agg
      |  UNION ALL SELECT 2, 'min_tokens', s2, total FROM agg
      |  UNION ALL SELECT 3, 'word_len', s3, total FROM agg
      |  UNION ALL SELECT 4, 'lang_en', s4, total FROM agg)
      |ORDER BY stage""".stripMargin
      .replace("TOKS", toks)
  }

  // --------------------------------------------------------------------
  // q127 — dedup cluster-size histogram: LSH candidate pairs →
  // connected components (star variant, O(log n) rounds) → component
  // sizes → size histogram. The daily "how duplicated is the corpus"
  // report; singleton docs count as clusters of 1. The oracle re-walks
  // the same components via the q61 recursive-CTE closure.
  def q127(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val pairs = graft.ext.TextDedup
      .lshCandidates(docs, "text", "doc_id", ngram = 3, numHashes = 4, bands = 1)
    graft.ext.TextDedup
      .connectedComponentsStar(pairs, docs.select($"doc_id"), nodeCol = "doc_id")
      .groupBy($"component").agg(count(lit(1)).as("cluster_size"))
      .groupBy($"cluster_size")
      .agg(count(lit(1)).as("n_clusters"),
        sum($"cluster_size").cast("long").as("n_docs"))
      .orderBy($"cluster_size")
  }

  val q127Sql: String = {
    val ng = DocOps.ngramsSql(3)
    s"""WITH RECURSIVE sig AS (
       | SELECT doc_id,
       |  ${DocOps.minhashChunkSql(ng, 0)} || '|' || ${DocOps.minhashChunkSql(ng, 1)} || '|' ||
       |  ${DocOps.minhashChunkSql(ng, 2)} || '|' || ${DocOps.minhashChunkSql(ng, 3)} AS band
       | FROM documents),
       | pairs AS (SELECT a.doc_id AS ia, b.doc_id AS ib
       |           FROM sig a JOIN sig b
       |             ON a.band = b.band AND a.doc_id < b.doc_id),
       | edges AS (SELECT ia AS a, ib AS b FROM pairs
       |           UNION SELECT ib, ia FROM pairs),
       | reach(src, dst) AS (
       |   SELECT a, b FROM edges
       |   UNION
       |   SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
       | labels AS (
       |   SELECT d.doc_id AS node,
       |          least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS component
       |   FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
       |   GROUP BY d.doc_id),
       | sizes AS (SELECT component, count(*) AS cluster_size
       |           FROM labels GROUP BY 1)
       |SELECT cluster_size, count(*) AS n_clusters,
       |       CAST(sum(cluster_size) AS BIGINT) AS n_docs
       |FROM sizes GROUP BY 1 ORDER BY cluster_size""".stripMargin
  }

  // --------------------------------------------------------------------
  // q128 — cross-source contamination matrix: for each source pair, how
  // many distinct 5-grams they share verbatim — the "which crawls bled
  // into each other" report behind decontamination policy. Layout is
  // the q20/q21 lesson applied: distinct (source, ngram) computed ONCE,
  // grouped by ngram, in-bucket source pairs expanded with array
  // lambdas — one shuffle on the ngram hash, never a self-join that
  // re-derives the shingle pipeline on both branches, never |docs|².
  def q128(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = t(s, dir, "documents")
      .withColumn("toks", TextFns.tokens($"text"))
      .select($"source",
        explode(graft.plans.TextExpressions.distinctNgrams($"toks", 5)).as("ng"))
      .distinct()
    val pairs = flatten(transform($"srcs", (a, i) =>
      transform(slice($"srcs", i + lit(2), size($"srcs")),
        b => struct(a.as("source_a"), b.as("source_b")))))
    sh.groupBy($"ng")
      .agg(sort_array(collect_set($"source")).as("srcs"))
      .filter(size($"srcs") > 1)
      .select(explode(pairs).as("p"))
      .groupBy($"p.source_a".as("source_a"), $"p.source_b".as("source_b"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .orderBy($"source_a", $"source_b")
  }

  val q128Sql: String = {
    val ng = DocOps.ngramsSql(5)
    s"""WITH sh AS (
       | SELECT DISTINCT source, unnest(list_distinct($ng)) AS ng
       | FROM documents)
       |SELECT a.source AS source_a, b.source AS source_b,
       |       count(*) AS shared_ngrams
       |FROM sh a JOIN sh b ON a.ng = b.ng AND a.source < b.source
       |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin
  }

  // --------------------------------------------------------------------
  // q129 — nucleus (top-p) selection: per source, keep the largest docs
  // until 80% of the source's char mass is covered — the budgeted
  // "best docs first" selection step. The 80% threshold is integer
  // cross-multiplied (5·cum ≤ 4·total): no float ever exists, so the
  // kept set is bit-identical on any engine. The per-source cumsum is
  // the keyed two-pass (GlobalRank.withKeyedPrefixSum — a PARTITION BY
  // source window would sort each source's whole extent in ONE task,
  // the few-source 100 TB pathology); the per-source totals are a
  // plain agg broadcast back.
  def q129(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .select($"source", $"doc_id", $"n_chars")
    val tot = d.groupBy($"source")
      .agg(sum($"n_chars").as("tot"), count(lit(1)).as("n_total"))
    graft.operators.GlobalRank
      .withKeyedPrefixSum(
        d.withColumn("__nc", $"n_chars".cast("long")),
        Seq("source"), Seq($"n_chars".desc, $"doc_id"), "__nc", "cumb")
      .join(broadcast(tot), "source")
      .filter(($"cumb" + $"n_chars") * 5 <= $"tot" * 4)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_kept"),
        sum($"n_chars").cast("long").as("chars_kept"),
        max($"n_total").as("n_total"))
      .select($"source", $"n_kept", $"chars_kept",
        expr("n_kept * 1000000 div n_total").as("kept_ppm"))
      .orderBy($"source")
  }

  val q129Sql: String =
    """WITH ranked AS (
      |  SELECT source, doc_id, n_chars,
      |    sum(n_chars) OVER (PARTITION BY source
      |                       ORDER BY n_chars DESC, doc_id) AS cum,
      |    sum(n_chars) OVER (PARTITION BY source) AS tot,
      |    count(*) OVER (PARTITION BY source) AS n_total
      |  FROM documents)
      |SELECT source, count(*) AS n_kept,
      |       CAST(sum(n_chars) AS BIGINT) AS chars_kept,
      |       CAST(count(*) * 1000000 // max(n_total) AS BIGINT) AS kept_ppm
      |FROM ranked WHERE cum * 5 <= tot * 4
      |GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q126_filter_cascade" -> (q126 _),
    "q127_cluster_sizes" -> (q127 _),
    "q128_contamination_matrix" -> (q128 _),
    "q129_nucleus_selection" -> (q129 _))

  val oracles: Map[String, String] = Map(
    "q126_filter_cascade" -> q126Sql,
    "q127_cluster_sizes" -> q127Sql,
    "q128_contamination_matrix" -> q128Sql,
    "q129_nucleus_selection" -> q129Sql)
}
