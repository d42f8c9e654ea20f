package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 batch (q170–q172) — classifier-eval and corpus-profiling
  * stages a training-data pipeline runs beside AUC (q158):
  *
  *  - q170 calibration bins + expected calibration error (is the
  *    quality classifier's score a probability, or just a ranking?);
  *  - q171 exact average precision / P@k (the retrieval-side metric
  *    for the same classifier — rank-sensitive where AUC is not);
  *  - q172 vocabulary growth (Heaps-law curve) + Chao1 richness (how
  *    much unseen vocabulary remains — a dedup/coverage planning
  *    signal).
  *
  * All three are integer-exact: ppm/micro floor arithmetic over exact
  * counts, so no float partial-sum order can flip a gate digit at any
  * partitioning (the q88/q158 doctrine).
  */
object Extended16 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------------
  // q170 — calibration bins + ECE: treat conf = n_chars/max(n_chars)
  // (in ppm) as the classifier's P(lang=en) and bin into deciles.
  // Per-bin |accuracy − confidence| never leaves integer space:
  // |acc_b − conf̄_b| · n_b  =  |n_pos_b·10⁶ − Σconf_b| / 10⁶, so
  // ECE_ppm = Σ_b |n_pos_b·10⁶ − Σconf_b| div N exactly.
  //
  // Scale: one map-side-combinable 10-group agg over the corpus; the
  // ECE fold-up runs on the 10-row bin frame (broadcast back). The
  // max(n_chars) scalar is a broadcast, not a collect-into-loop.
  def q170(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
    val mx = d.agg(max($"n_chars").as("mx"))
    val bins = d.crossJoin(broadcast(mx))
      .select(
        expr("n_chars * 1000000 div mx").as("conf_ppm"),
        when($"lang" === "en", 1L).otherwise(0L).as("pos"))
      .select(least(expr("conf_ppm div 100000"), lit(9L)).as("bin"),
        $"conf_ppm", $"pos")
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum($"pos").as("n_pos"),
        sum($"conf_ppm").as("sum_conf_ppm"))
      .withColumn("gap_abs", abs($"n_pos" * 1000000L - $"sum_conf_ppm"))
    val ece = bins.agg(
      expr("sum(gap_abs) div sum(n)").as("ece_ppm"))
    bins.crossJoin(broadcast(ece))
      .select($"bin", $"n", $"n_pos", $"sum_conf_ppm", $"gap_abs",
        $"ece_ppm")
      .orderBy($"bin")
  }

  val q170Sql: String =
    """WITH mx AS (SELECT max(n_chars) AS mx FROM documents),
      | conf AS (SELECT n_chars * 1000000 // mx AS conf_ppm,
      |        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |        FROM documents, mx),
      | bins AS (SELECT LEAST(conf_ppm // 100000, 9) AS bin,
      |        count(*) AS n,
      |        CAST(SUM(pos) AS BIGINT) AS n_pos,
      |        CAST(SUM(conf_ppm) AS BIGINT) AS sum_conf_ppm
      |        FROM conf GROUP BY 1),
      | tot AS (SELECT CAST(SUM(ABS(n_pos * 1000000 - sum_conf_ppm))
      |          // SUM(n) AS BIGINT) AS ece_ppm FROM bins)
      |SELECT CAST(bin AS BIGINT) AS bin, n, n_pos, sum_conf_ppm,
      |       CAST(ABS(n_pos * 1000000 - sum_conf_ppm) AS BIGINT)
      |         AS gap_abs,
      |       ece_ppm
      |FROM bins, tot ORDER BY bin""".stripMargin

  // --------------------------------------------------------------------
  // q171 — exact average precision + P@100 for the same ranking
  // (score = n_chars, relevant = lang 'en'), ordered (score DESC,
  // doc_id ASC) — a total order, so every rank statistic is
  // deterministic. AP needs tp_k at every relevant rank k; both the
  // global rank and the exclusive prefix sum of rel come from ONE
  // GlobalRank.withRankAndPrefixSum pass (range-partition + two
  // bounded passes — NEVER an unpartitioned window; the q158 rule).
  // Contribution per relevant doc = (tp_before+1)·10⁶ div k — the
  // micro-precision at its own rank; AP_ppm = their sum div n_pos.
  def q171(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "documents")
      .select($"doc_id", $"n_chars".as("score"),
        when($"lang" === "en", 1L).otherwise(0L).as("rel"))
    graft.operators.GlobalRank
      .withRankAndPrefixSum(base, Seq($"score".desc, $"doc_id".asc),
        "rel", "k", "tp_before")
      .agg(
        count(lit(1)).as("n"),
        sum($"rel").as("n_pos"),
        sum(when($"rel" === 1L,
          expr("(tp_before + 1) * 1000000 div k"))).as("ap_sum_micro"),
        sum(when($"k" <= 100L, $"rel").otherwise(0L)).as("tp100"))
      .select($"n", $"n_pos",
        expr("ap_sum_micro div n_pos").as("ap_ppm"),
        ($"tp100" * 10000L).as("p100_ppm"))
  }

  val q171Sql: String =
    """WITH r AS (SELECT doc_id, n_chars AS score,
      |        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel
      |        FROM documents),
      | o AS (SELECT rel,
      |        row_number() OVER (ORDER BY score DESC, doc_id ASC) AS k,
      |        COALESCE(SUM(rel) OVER (ORDER BY score DESC, doc_id ASC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |          AS tp_before
      |        FROM r)
      |SELECT count(*) AS n,
      |       CAST(SUM(rel) AS BIGINT) AS n_pos,
      |       CAST(SUM(CASE WHEN rel = 1
      |                 THEN (tp_before + 1) * 1000000 // k END)
      |            // SUM(rel) AS BIGINT) AS ap_ppm,
      |       CAST(SUM(CASE WHEN k <= 100 THEN rel ELSE 0 END) * 10000
      |            AS BIGINT) AS p100_ppm
      |FROM o""".stripMargin

  // --------------------------------------------------------------------
  // q172 — vocabulary growth (Heaps-law curve) + Chao1 richness: split
  // the corpus into 10 doc-id deciles; per decile, tokens ingested and
  // NEW types (tokens whose first occurrence lands there), plus the
  // cumulative curve — (cum_tokens, cum_types) pairs are the Heaps
  // plot. Chao1 (bias-corrected, V + f1(f1−1)/(2(f2+1)) in micro
  // units) estimates total vocabulary including the unseen tail from
  // the singleton/doubleton counts — all exact integers.
  //
  // Scale: one (token → min bucket, count) hash agg over the exploded
  // corpus; everything after runs on the 10-row bucket frame and the
  // 3-scalar richness frame. The cumsum window orders a BOUNDED
  // 10-value domain (the q139/q140 class — documented, never a
  // row-count-sized orderBy). First-bucket = bucket(min doc_id)
  // because the bucket function is monotone in doc_id.
  def q172(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
    val mx = d.agg(max($"doc_id").as("mx"))
    val tok = d.crossJoin(broadcast(mx))
      .select(expr("doc_id * 10 div (mx + 1)").as("bucket"),
        explode(split(trim($"text"), "\\s+")).as("token"))
    val perTok = tok.groupBy($"token")
      .agg(min($"bucket").as("fb"), count(lit(1)).as("cf"))
    val newTypes = perTok.groupBy($"fb".as("bucket"))
      .agg(count(lit(1)).as("new_types"))
    val bucketTokens = tok.groupBy($"bucket")
      .agg(count(lit(1)).as("bucket_tokens"))
    val rich = perTok.agg(
      count(lit(1)).as("v_total"),
      sum(when($"cf" === 1L, 1L).otherwise(0L)).as("f1"),
      sum(when($"cf" === 2L, 1L).otherwise(0L)).as("f2"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    bucketTokens
      .join(newTypes, Seq("bucket"), "left")
      .na.fill(0L, Seq("new_types"))
      .crossJoin(broadcast(rich))
      .select($"bucket", $"new_types",
        sum($"new_types").over(w).as("cum_types"),
        $"bucket_tokens",
        sum($"bucket_tokens").over(w).as("cum_tokens"),
        $"v_total",
        expr("v_total * 1000000 + (f1 * (f1 - 1) * 1000000) div (2 * (f2 + 1))")
          .as("chao1_micro"))
      .orderBy($"bucket")
  }

  val q172Sql: String =
    """WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
      | tok AS (SELECT doc_id * 10 // (mx + 1) AS bucket,
      |        unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      |        FROM documents, mx),
      | per_tok AS (SELECT token, min(bucket) AS fb, count(*) AS cf
      |        FROM tok GROUP BY token),
      | nt AS (SELECT fb AS bucket, count(*) AS new_types
      |        FROM per_tok GROUP BY fb),
      | tb AS (SELECT bucket, count(*) AS bucket_tokens
      |        FROM tok GROUP BY bucket),
      | ch AS (SELECT count(*) AS v_total,
      |        SUM(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS f1,
      |        SUM(CASE WHEN cf = 2 THEN 1 ELSE 0 END) AS f2
      |        FROM per_tok),
      | g AS (SELECT tb.bucket, COALESCE(nt.new_types, 0) AS new_types,
      |        tb.bucket_tokens
      |        FROM tb LEFT JOIN nt USING (bucket))
      |SELECT bucket, CAST(new_types AS BIGINT) AS new_types,
      |       CAST(SUM(new_types) OVER (ORDER BY bucket) AS BIGINT)
      |         AS cum_types,
      |       CAST(bucket_tokens AS BIGINT) AS bucket_tokens,
      |       CAST(SUM(bucket_tokens) OVER (ORDER BY bucket) AS BIGINT)
      |         AS cum_tokens,
      |       CAST(v_total AS BIGINT) AS v_total,
      |       CAST(v_total * 1000000
      |            + (f1 * (f1 - 1) * 1000000) // (2 * (f2 + 1))
      |            AS BIGINT) AS chao1_micro
      |FROM g, ch ORDER BY bucket""".stripMargin

  /** Name → query function, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q170_calibration_ece" -> (q170 _),
    "q171_average_precision" -> (q171 _),
    "q172_vocab_growth" -> (q172 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q170_calibration_ece" -> q170Sql,
    "q171_average_precision" -> q171Sql,
    "q172_vocab_growth" -> q172Sql
  )
}
