package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.HashSplit

/** Round-8 second batch (q147–q150) — sketching, sampling and corpus
  * analytics:
  *
  *  - q147 count-min sketch: the mergeable frequency sketch (two
  *    md5-salted hash rows), estimates vs truth for the top tokens;
  *  - q148 deterministic stratified top-k sample (md5-ranked, exact k
  *    per stratum — reproducible unlike rand()/TABLESAMPLE);
  *  - q149 weekly retention cohort matrix (cohort × offset);
  *  - q150 token co-occurrence lift within the top-20 vocabulary
  *    (grouped in-bucket expansion — q128's trick — never docs²).
  */
object Extended10 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** First 8 hex chars of md5(expr) as BIGINT (Horner) — DuckDB
    * rendering of [[HashSplit.bucket]]. */
  private def hex8Sql(e: String): String = {
    def hexVal(i: Int) =
      s"""(CASE WHEN ascii(substr(md5($e), $i, 1)) >= 97
         | THEN ascii(substr(md5($e), $i, 1)) - 87
         | ELSE ascii(substr(md5($e), $i, 1)) - 48 END)""".stripMargin
    (1 to 8).foldLeft("CAST(0 AS BIGINT)")(
      (acc, i) => s"($acc * 16 + ${hexVal(i)})")
  }

  // --------------------------------------------------------------------
  // q147 — count-min sketch: the bounded-memory mergeable frequency
  // sketch a 100 TB profiler keeps per shard (cells add across shards —
  // the same merge story as q117's HLL registers). Two hash rows
  // (md5 salts 'a'/'b') × 64 buckets; a token's estimate = min over
  // rows of its bucket's total — ≥ truth by construction, equality iff
  // no collision. The query builds the 128-cell sketch, then reads the
  // corpus top-10 tokens back through it, reporting estimate vs truth
  // and the overcount — the collision-error surface, pinned exactly
  // (md5 buckets are engine-portable, so the oracle reproduces the
  // SAME collisions bit-for-bit).
  //
  // Scale: the sketch build is one (salt, bucket)-keyed agg with
  // map-side combine onto 128 cells; truth for the top-k only is the
  // standard heavy-hitter agg (q93's salting note applies to the
  // token-keyed stage).
  def q147(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select(explode(TextFns.tokens($"text")).as("tok"))
    val truth = toks.groupBy($"tok").agg(count(lit(1)).as("true_cnt"))
    val cells = toks
      .select(explode(array(lit("a"), lit("b"))).as("salt"), $"tok")
      .withColumn("bucket", HashSplit.bucket(concat($"salt", $"tok"), 64))
      .groupBy($"salt", $"bucket").agg(count(lit(1)).as("cell"))
    val top = truth.orderBy($"true_cnt".desc, $"tok").limit(10)
      .select($"tok", $"true_cnt",
        explode(array(lit("a"), lit("b"))).as("salt"))
      .withColumn("bucket", HashSplit.bucket(concat($"salt", $"tok"), 64))
    top.join(cells, Seq("salt", "bucket"))
      .groupBy($"tok", $"true_cnt")
      .agg(min($"cell").as("est_cnt"))
      .select($"tok", $"true_cnt", $"est_cnt",
        ($"est_cnt" - $"true_cnt").as("overcount"))
      .orderBy($"true_cnt".desc, $"tok")
  }

  val q147Sql: String = {
    val toks = DocOps.tokensSql
    s"""WITH tk AS (SELECT unnest($toks) AS tok FROM documents),
       | truth AS (SELECT tok, count(*) AS true_cnt FROM tk GROUP BY tok),
       | salted AS (SELECT tok, s.salt FROM tk,
       |            (SELECT unnest(['a','b']) AS salt) s),
       | cells AS (SELECT salt, ${hex8Sql("salt || tok")} % 64 AS bucket,
       |             count(*) AS cell
       |           FROM salted GROUP BY 1, 2),
       | top AS (SELECT tok, true_cnt FROM truth
       |         ORDER BY true_cnt DESC, tok LIMIT 10),
       | probe AS (SELECT t.tok, t.true_cnt, s.salt,
       |             ${hex8Sql("s.salt || t.tok")} % 64 AS bucket
       |           FROM top t, (SELECT unnest(['a','b']) AS salt) s)
       |SELECT p.tok, p.true_cnt, min(c.cell) AS est_cnt,
       |       CAST(min(c.cell) - p.true_cnt AS BIGINT) AS overcount
       |FROM probe p JOIN cells c ON p.salt = c.salt AND p.bucket = c.bucket
       |GROUP BY p.tok, p.true_cnt
       |ORDER BY p.true_cnt DESC, p.tok""".stripMargin
  }

  // --------------------------------------------------------------------
  // q148 — deterministic stratified top-k sample: exactly 5 docs per
  // language, picked by md5(doc_id) rank — a reproducible "random"
  // sample (same rows on any engine, cluster size, or run; rand() and
  // TABLESAMPLE are neither portable nor stable). The md5 rank IS the
  // sampling randomness; doc_id tie-break makes the order total.
  //
  // Scale: one window per stratum (shuffle keyed by lang) — and since
  // only the top-5 per key survive, a cluster run would use the
  // rank<=k pushdown (WindowGroupLimit pushes the limit into the
  // sort) rather than ranking every row.
  def q148(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    t(s, dir, "documents")
      .select($"doc_id", $"lang", $"n_chars")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"lang", $"rk", $"doc_id", $"n_chars")
      .orderBy($"lang", $"rk")
  }

  val q148Sql: String =
    """WITH r AS (
      |  SELECT doc_id, lang, n_chars,
      |         row_number() OVER (PARTITION BY lang
      |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, n_chars
      |FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin

  // --------------------------------------------------------------------
  // q149 — weekly retention cohort matrix: users grouped by first-seen
  // week (cohort), counted in each later week they return — the
  // engagement table behind every "week-N retention" chart. Weeks are
  // days-since-epoch div 7 (fixed anchor: deterministic, no corpus
  // scan needed). distinct (user, week) first, so a user's many events
  // in a week count once.
  //
  // Scale: distinct on (user, week) — one shuffle; the cohort join is
  // per-user (min-week broadcast-able only if users are few; keyed
  // shuffle join in general); final agg is cohort×offset — tiny.
  def q149(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // floor BOTH divisions: double-division-then-cast would TRUNCATE
    // toward zero, diverging from the oracle's floor `//` for pre-epoch
    // timestamps (negative day numbers)
    val uw = t(s, dir, "events")
      .select($"user_id",
        floor(floor(unix_timestamp($"ts") / 86400) / 7).cast("long").as("wk"))
      .distinct()
    val cohort = uw.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
    uw.join(cohort, "user_id")
      .groupBy($"cohort_wk", ($"wk" - $"cohort_wk").as("offset_wk"))
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_wk", $"offset_wk")
  }

  val q149Sql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id,
      |         CAST(floor(epoch(ts) / 86400) AS BIGINT) // 7 AS wk
      |  FROM events),
      | c AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY user_id)
      |SELECT c.cohort_wk, uw.wk - c.cohort_wk AS offset_wk,
      |       count(DISTINCT uw.user_id) AS n_users
      |FROM uw JOIN c ON uw.user_id = c.user_id
      |GROUP BY 1, 2 ORDER BY cohort_wk, offset_wk""".stripMargin

  // --------------------------------------------------------------------
  // q150 — token co-occurrence lift over the top-20 vocabulary:
  // lift(a,b) = P(a,b)/(P(a)·P(b)) in integer ppm — the corpus
  // association signal (collocations, template detection). Pair
  // expansion happens per-DOCUMENT over the ≤20 vocab tokens present
  // (the q128 grouped-expansion trick): pair volume ≤ docs·C(20,2),
  // never docs². The unigram doc-counts broadcast.
  //
  // Scale: one distinct (doc, tok) shuffle + one pair-keyed agg; the
  // top-20 vocab is driver-small by construction.
  def q150(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val tot = docs.agg(count(lit(1)).as("n_docs"))
    val tk = docs
      .select($"doc_id", explode(array_distinct(TextFns.tokens($"text")))
        .as("tok"))
    val vocab = tk.groupBy($"tok").agg(count(lit(1)).as("n_docs_tok"))
      .orderBy($"n_docs_tok".desc, $"tok").limit(20)
    val inVocab = tk.join(broadcast(vocab.select($"tok")), "tok")
    val pairExp = flatten(transform($"ts", (a, i) =>
      transform(slice($"ts", i + lit(2), size($"ts")),
        b => struct(a.as("tok_a"), b.as("tok_b")))))
    inVocab
      .groupBy($"doc_id").agg(sort_array(collect_set($"tok")).as("ts"))
      .filter(size($"ts") > 1)
      .select(explode(pairExp).as("p"))
      .groupBy($"p.tok_a".as("tok_a"), $"p.tok_b".as("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
      .join(broadcast(vocab.select($"tok".as("tok_a"),
        $"n_docs_tok".as("n_a"))), "tok_a")
      .join(broadcast(vocab.select($"tok".as("tok_b"),
        $"n_docs_tok".as("n_b"))), "tok_b")
      .crossJoin(broadcast(tot))
      .select($"tok_a", $"tok_b", $"n_ab",
        expr("n_ab * 1000000L * n_docs div (n_a * n_b)").as("lift_ppm"))
      .orderBy($"tok_a", $"tok_b")
  }

  val q150Sql: String = {
    val toks = DocOps.tokensSql
    s"""WITH tk AS (SELECT DISTINCT doc_id, unnest(list_distinct($toks)) AS tok
       |            FROM documents),
       | vocab AS (SELECT tok, count(*) AS n_docs_tok FROM tk GROUP BY tok
       |           ORDER BY n_docs_tok DESC, tok LIMIT 20),
       | iv AS (SELECT tk.doc_id, tk.tok FROM tk
       |        JOIN vocab ON tk.tok = vocab.tok),
       | pairs AS (SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_ab
       |           FROM iv a JOIN iv b
       |             ON a.doc_id = b.doc_id AND a.tok < b.tok
       |           GROUP BY 1, 2),
       | n AS (SELECT count(*) AS n_docs FROM documents)
       |SELECT p.tok_a, p.tok_b, p.n_ab,
       |       CAST(p.n_ab * 1000000 * n.n_docs
       |            // (va.n_docs_tok * vb.n_docs_tok) AS BIGINT) AS lift_ppm
       |FROM pairs p
       |JOIN vocab va ON p.tok_a = va.tok
       |JOIN vocab vb ON p.tok_b = vb.tok, n
       |ORDER BY p.tok_a, p.tok_b""".stripMargin
  }

  /** Name → query function, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q147_count_min_sketch" -> (q147 _),
    "q148_stratified_sample" -> (q148 _),
    "q149_retention_cohorts" -> (q149 _),
    "q150_cooccurrence_lift" -> (q150 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q147_count_min_sketch" -> q147Sql,
    "q148_stratified_sample" -> q148Sql,
    "q149_retention_cohorts" -> q149Sql,
    "q150_cooccurrence_lift" -> q150Sql
  )
}
