package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{AsOfJoin, HashSplit, Sessionize}

/** Round-2 extension queries: the operators a large-scale pipeline needs
  * beyond the reference's own surface (SURVEY.md §7.5) — temporal joins
  * (as-of), sessionization, multi-level aggregation (rollup), exact
  * percentiles, per-group top-k, pivot, corpus statistics (word
  * frequency, distinct aggs), deterministic dataset splitting, dedup
  * variants (keep-best, SimHash hamming pairs), IVF ANN, and multimodal
  * frame sampling.
  *
  * Every query is a single declarative plan; scale notes per query.
  */
object Extended {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------------
  // q38 — gap-based sessionization (graft.operators.Sessionize): the
  // batch analog of streaming session windows and of the reference
  // domain's per-bike trip chaining. ONE shuffle on the key; two O(rows)
  // window sweeps; no self-join.
  def q38(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sessionize.sessionStats(t(s, dir, "events"),
        keyCols = Seq("user_id"), tsCol = "ts", gapSec = 1800,
        tieCols = Seq("event_id"))
      .orderBy($"user_id")
  }

  val q38Sql: String =
    """WITH x AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |    THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      | s AS (
      |  SELECT user_id,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM x),
      | per AS (SELECT user_id, session_id, count(*) AS n
      |         FROM s GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_sessions,
      |       CAST(sum(n) AS BIGINT) AS n_events, max(n) AS longest_session
      |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------------
  // q39 — backward as-of join (graft.operators.AsOfJoin): purchase →
  // latest preceding click by the same user (click attribution). The
  // union-and-sweep plan shuffles ONCE on the key — cost independent of
  // how many right rows precede each left row, unlike the naive
  // join+argmax the oracle runs.
  def q39(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id",
        $"ts".as("purchase_ts"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id", $"value")
    AsOfJoin.backward(purchases, clicks,
        keyCols = Seq("user_id"), leftTime = "purchase_ts", rightTime = "ts",
        rightPayload = Seq("event_id", "value"), prefix = "click_")
      .select($"purchase_id", $"user_id", $"purchase_ts",
        $"click_event_id".as("click_id"), $"click_ts", $"click_value")
      .orderBy($"purchase_id")
  }

  val q39Sql: String =
    """SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
      |       max_by(c.event_id, c.ts) AS click_id, max(c.ts) AS click_ts,
      |       max_by(c.value, c.ts) AS click_value
      |FROM events p LEFT JOIN events c
      |  ON c.user_id = p.user_id AND c.event_type = 'click'
      | AND c.ts <= p.ts
      |WHERE p.event_type = 'purchase'
      |GROUP BY 1, 2, 3 ORDER BY purchase_id""".stripMargin

  // --------------------------------------------------------------------
  // q40 — ROLLUP multi-level aggregation: per (type, month), per type,
  // and grand total in ONE pass (Expand + single hash agg — no N scans
  // like the reference's 11-query metrics job). Integer measures keep
  // the cross-engine comparison exact.
  def q40(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_type", date_format($"ts", "yyyy-MM").as("month"),
        floor($"value").cast("long").as("v"))
      .rollup($"event_type", $"month")
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_value"))
      .select(
        coalesce($"event_type", lit("ALL")).as("event_type"),
        coalesce($"month", lit("ALL")).as("month"),
        $"n", $"sum_value")
      .orderBy($"event_type", $"month")
  }

  val q40Sql: String =
    """WITH e AS (SELECT event_type, strftime(ts, '%Y-%m') AS month,
      |                  CAST(floor(value) AS BIGINT) AS v FROM events)
      |SELECT coalesce(event_type, 'ALL') AS event_type,
      |       coalesce(month, 'ALL') AS month,
      |       count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_value
      |FROM e GROUP BY ROLLUP (event_type, month)
      |ORDER BY event_type, month""".stripMargin

  // --------------------------------------------------------------------
  // q41 — exact percentiles per group (Spark `percentile`, true sorted-
  // interpolated quantiles, not approx). Integer inputs + quarter
  // quantiles make the interpolation IEEE-exact in every engine
  // (a + (b-a)*f vs a*(1-f)+b*f agree bit-for-bit on ints with f in
  // {0.25, 0.5, 0.75}). At scale, swap for approx_percentile — same
  // plan shape, sketch-mergeable.
  def q41(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_type", floor($"value").cast("int").as("iv"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(iv, 0.25)").as("p25"),
        expr("percentile(iv, 0.5)").as("p50"),
        expr("percentile(iv, 0.75)").as("p75"))
      .orderBy($"event_type")
  }

  val q41Sql: String =
    """SELECT event_type, count(*) AS n,
      | quantile_cont(CAST(floor(value) AS INTEGER), 0.25) AS p25,
      | quantile_cont(CAST(floor(value) AS INTEGER), 0.5) AS p50,
      | quantile_cont(CAST(floor(value) AS INTEGER), 0.75) AS p75
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------
  // q42 — top-k per group via ranked window over a pre-aggregate: the
  // generalization of the reference's per-day top-5 (T1/T2) to N groups
  // in one job. The window input is already aggregated (|groups| ×
  // |users| rows), so the rank sort is cheap at any scale.
  def q42(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = t(s, dir, "events")
      .groupBy($"event_type", $"user_id")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"event_type").orderBy($"n".desc, $"user_id".asc)
    counts.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .orderBy($"event_type", $"rk")
  }

  val q42Sql: String =
    """SELECT event_type, user_id, n, rk FROM (
      |  SELECT event_type, user_id, count(*) AS n,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY count(*) DESC, user_id ASC) AS rk
      |  FROM events GROUP BY 1, 2) x
      |WHERE rk <= 3 ORDER BY event_type, rk""".stripMargin

  // --------------------------------------------------------------------
  // q43 — pivot (wide daily matrix: day × event_type → counts), the
  // dashboard-feed shape. Explicit value list keeps the plan a single
  // hash agg (no extra distinct-values job).
  def q43(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(to_date($"ts").as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0)
      .orderBy($"day")
  }

  val q43Sql: String =
    """SELECT CAST(ts AS DATE) AS day,
      | count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      | count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      | count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      | count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      | count(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  // --------------------------------------------------------------------
  // q44 — corpus word frequency (explode + count + top-k): the
  // vocabulary/Zipf statistics pass of a text pipeline. Partial
  // map-side aggregation collapses repeats before the shuffle; top-20
  // is TakeOrderedAndProject.
  def q44(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(explode(TextFns.tokens($"text")).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"word".asc)
      .limit(20)
  }

  val q44Sql: String =
    """SELECT word, count(*) AS n
      |FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
      |      FROM documents) x
      |GROUP BY word ORDER BY n DESC, word ASC LIMIT 20""".stripMargin

  // --------------------------------------------------------------------
  // q45 — deterministic hash split (graft.operators.HashSplit): stable
  // train/val/test assignment from md5(id) — reproducible across
  // engines, runs, and cluster sizes, unlike rand() or Spark's
  // non-portable hash(). Purely scalar, no shuffle except the summary.
  def q45(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id",
        HashSplit.assign($"doc_id",
          Seq("train" -> 8, "val" -> 1, "test" -> 1)).as("split"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n"), min($"doc_id").as("min_id"),
        max($"doc_id").as("max_id"), sum($"doc_id").as("sum_id"))
      .orderBy($"split")
  }

  val q45Sql: String = {
    def hexVal(i: Int) =
      s"""(CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) >= 97
         | THEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 87
         | ELSE ascii(substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 48 END)""".stripMargin
    // first 8 hex chars as a BIGINT (Horner), matching HashSplit.bucket
    val hex8 = (1 to 8).foldLeft("CAST(0 AS BIGINT)")(
      (acc, i) => s"($acc * 16 + ${hexVal(i)})")
    s"""WITH b AS (SELECT doc_id,
       |  $hex8 % 10 AS bucket FROM documents)
       |SELECT CASE WHEN bucket < 8 THEN 'train'
       |            WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
       |       count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id,
       |       CAST(sum(doc_id) AS BIGINT) AS sum_id
       |FROM b GROUP BY 1 ORDER BY split""".stripMargin
  }

  // --------------------------------------------------------------------
  // q46 — dedup keep-best: one representative per content fingerprint,
  // chosen by (n_chars DESC, doc_id ASC). Spark-first: a single hash
  // aggregate with a lexicographic max over struct(n_chars, -doc_id) —
  // partial map-side combine, NO window sort over the corpus (the
  // window formulation the oracle uses would sort 100 TB; the struct-max
  // reduces it map-side).
  def q46(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .withColumn("fp", md5($"text"))
      .groupBy($"fp")
      .agg(max(struct($"n_chars", (-$"doc_id").as("neg_id"),
        $"doc_id".as("keep_id"))).as("best"))
      .select($"fp", $"best.keep_id".as("keep_id"),
        $"best.n_chars".as("n_chars"))
      .orderBy($"fp")
  }

  val q46Sql: String =
    """SELECT fp, doc_id AS keep_id, n_chars FROM (
      |  SELECT md5(text) AS fp, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY md5(text)
      |      ORDER BY n_chars DESC, doc_id ASC) AS rk
      |  FROM documents) x
      |WHERE rk = 1 ORDER BY fp""".stripMargin

  // --------------------------------------------------------------------
  // q47 — SimHash near-duplicate PAIRS (32-bit, hamming <= 2) via band
  // pigeonhole: 4 bands of 8 bits; any pair within hamming 3 shares at
  // least one identical band, so the self-join key is the band value —
  // candidate volume ~ sum of bucket^2, not |docs|^2. The verify filter
  // (bit_count(xor) <= 2) runs only on candidates. This completes the
  // SimHash dedup path (q22 computes fingerprints; this emits pairs).
  def q47(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.ext.TextDedup
      .simhashCandidates(t(s, dir, "documents"), "text", "doc_id",
        bits = 32, bands = 4, maxHamming = 2)
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"))
      .orderBy($"doc_a", $"doc_b")
  }

  val q47Sql: String = {
    val toks = """regexp_split_to_array(trim(text), '\s+')"""
    val bits = (0 until 32).map { bit =>
      s"""(CASE WHEN CAST(list_sum(list_transform($toks,
         |   t -> CASE WHEN ascii(substr(md5(t), ${bit + 1}, 1)) % 2 = 1
         |        THEN 1 ELSE -1 END)) AS BIGINT) > 0
         | THEN ${1L << bit} ELSE 0 END)""".stripMargin
    }.mkString(" + ")
    s"""WITH s AS (SELECT doc_id, CAST($bits AS BIGINT) AS h FROM documents)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM s a JOIN s b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.h, b.h)) <= 2
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // --------------------------------------------------------------------
  // q48 — multi-distinct aggregation (distinct users + distinct days per
  // type in one statement): Catalyst expands to a single multi-phase
  // plan; at scale the exact distincts swap for HLL
  // (approx_count_distinct) with the same query shape.
  def q48(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("n_users"),
        countDistinct(to_date($"ts")).as("n_days"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  val q48Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
      | count(DISTINCT CAST(ts AS DATE)) AS n_days, count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------
  // q49 — IVF ANN search (graft.ext.VectorIndex): deterministic k-means
  // train (2 Lloyd iterations, 8 cells), assign, probe the 3 closest
  // cells, exact cosine inside them. The k-means loop is FIXED-iteration
  // from deterministic seeds (first k by vec_id), so it IS
  // SQL-expressible: each Lloyd step unrolls to one assignment CTE
  // (argmax cosine, ties → max cell, matching greatest(struct)) plus one
  // update CTE (per-cell component means cast to REAL, mirroring the
  // Array[Float] centroids); empty cells keep their previous centroid
  // via LEFT JOIN + coalesce. Centroids only drive DISCRETE decisions
  // (cell membership, probe choice); the emitted cos_sim is against the
  // raw query vector — numerically the same comparison q23 already
  // hash-matches. VectorIndexSpec holds the recall/equivalence
  // assertions (probe-all == brute force).
  def q49(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    val centroids = graft.ext.VectorIndex
      .trainCentroids(e, "embedding", k = 8, iterations = 2)
    val indexed = graft.ext.VectorIndex.assignCells(e, "embedding", centroids)
    val qvec = e.filter($"vec_id" === 0)
      .select($"embedding").collect()(0).getSeq[Float](0).toArray
    graft.ext.VectorIndex
      .search(s, indexed.filter($"vec_id" =!= 0), "embedding", "vec_id",
        centroids, qvec, k = 10, nProbe = 3)
      .withColumn("cos_sim", round($"cos_sim", 4))
  }

  val q49Sql: String = {
    // train→assign chain (e … af) via the SHARED deterministic-k-means
    // SQL builder — one encoding of trainCentroids/assignCells for
    // every k-means consumer (q49, q215); see [[KmeansOracle]].
    s"""WITH ${KmeansOracle.chain(k = 8, iterations = 2)},
       | q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       | pr AS (SELECT cell FROM (
       |          SELECT c2.cell, row_number() OVER (
       |            ORDER BY ${KmeansOracle.cos("c2.c", "q.qv")} DESC, c2.cell ASC) AS rn
       |          FROM c2 CROSS JOIN q) WHERE rn <= 3)
       |SELECT e.vec_id, round(${KmeansOracle.cos("e.v", "q.qv")}, 4) AS cos_sim
       |FROM e JOIN af USING (vec_id) CROSS JOIN q
       |WHERE e.vec_id <> 0 AND af.cell IN (SELECT cell FROM pr)
       |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin
  }

  // --------------------------------------------------------------------
  // q50 — multimodal frame sampling (graft.ext.Multimodal.sampleFrames):
  // video row → every 7th frame row, the generator-shaped decode stage
  // (1 → N). The stub decoder's deterministic arithmetic makes even the
  // flatMap oracle-checkable; payload bytes are produced by the resize
  // stage, so this exercises decode + resize + frame-sample plumbing in
  // one go.
  def q50(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = graft.ext.Multimodal
      .mediaFromDocuments(s, t(s, dir, "documents"))
    graft.ext.Multimodal.sampleFrames(media, stride = 7).toDF()
      .select($"media_id", $"frame_no",
        length($"payload").as("frame_bytes"))
      .orderBy($"media_id", $"frame_no")
  }

  val q50Sql: String =
    """SELECT doc_id AS media_id,
      | CAST(unnest(generate_series(0,
      |   (CASE WHEN strlen(text) = 0 THEN 0 ELSE ascii(text) END) % 30, 7))
      |   AS INTEGER) AS frame_no,
      | CAST(least(strlen(text), 64) AS INTEGER) AS frame_bytes
      |FROM documents ORDER BY media_id, frame_no""".stripMargin

  // --------------------------------------------------------------------
  // q51 — window FRAME specs (running + sliding aggregates per key):
  // cumulative sum and a 3-row moving sum, ordered by event_id within
  // user. One shuffle (partitionBy key); frames sweep sorted runs in
  // O(rows). Integer measures keep the comparison exact.
  def q51(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    t(s, dir, "events")
      .select($"user_id", $"event_id", floor($"value").cast("long").as("v"))
      .withColumn("running_sum",
        sum($"v").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("moving_sum3",
        sum($"v").over(w.rowsBetween(-2, Window.currentRow)))
      .orderBy($"user_id", $"event_id")
  }

  val q51Sql: String =
    """SELECT user_id, event_id, CAST(floor(value) AS BIGINT) AS v,
      | CAST(sum(CAST(floor(value) AS BIGINT)) OVER (
      |   PARTITION BY user_id ORDER BY event_id
      |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_sum,
      | CAST(sum(CAST(floor(value) AS BIGINT)) OVER (
      |   PARTITION BY user_id ORDER BY event_id
      |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_sum3
      |FROM events ORDER BY user_id, event_id""".stripMargin

  // --------------------------------------------------------------------
  // q52 — CUBE over (type, year): all four grouping sets in one Expand +
  // hash agg pass (the reference's many-scans metrics job, generalized).
  def q52(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_type", year($"ts").cast("string").as("yr"),
        floor($"value").cast("long").as("v"))
      .cube($"event_type", $"yr")
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_value"))
      .select(
        coalesce($"event_type", lit("ALL")).as("event_type"),
        coalesce($"yr", lit("ALL")).as("yr"),
        $"n", $"sum_value")
      .orderBy($"event_type", $"yr")
  }

  val q52Sql: String =
    """WITH e AS (SELECT event_type, CAST(year(ts) AS VARCHAR) AS yr,
      |                  CAST(floor(value) AS BIGINT) AS v FROM events)
      |SELECT coalesce(event_type, 'ALL') AS event_type,
      |       coalesce(yr, 'ALL') AS yr,
      |       count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_value
      |FROM e GROUP BY CUBE (event_type, yr)
      |ORDER BY event_type, yr""".stripMargin

  // --------------------------------------------------------------------
  // q53 — most distinctive term per document (tf/df ranking — the
  // integer-exact core of TF-IDF, engine-portable because the ratio
  // compares identical small ints in both engines): explode → tf per
  // (doc, word) → df per word → broadcast df back → rank per doc.
  // Scale: tf/df are partial-agg'd map-side; df (vocab-sized) is the
  // broadcast build side, so the corpus never shuffles for the join.
  def q53(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tf = t(s, dir, "documents")
      .select($"doc_id", explode(TextFns.tokens($"text")).as("word"))
      .groupBy($"doc_id", $"word")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id")
      .orderBy(($"tf".cast("double") / $"df").desc, $"word".asc)
    tf.join(broadcast(df), Seq("word"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"doc_id", $"word".as("term"), $"tf", $"df")
      .orderBy($"doc_id")
  }

  val q53Sql: String =
    """WITH toks AS (SELECT doc_id,
      |    unnest(regexp_split_to_array(trim(text), '\s+')) AS word
      |  FROM documents),
      | tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
      | df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      | r AS (SELECT doc_id, word, tf, df,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY CAST(tf AS DOUBLE) / df DESC, word ASC) AS rk
      |  FROM tf JOIN df USING (word))
      |SELECT doc_id, word AS term, tf, df FROM r WHERE rk = 1
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q54 — deterministic stratified sampling: per-language sampling rates
  // applied via the md5 bucket (graft.operators.HashSplit) — the
  // rebalancing step of corpus curation (downsample dominant languages),
  // reproducible across engines/runs/cluster sizes unlike sampleBy's
  // RNG. Scalar filter, no shuffle except the summary agg.
  def q54(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = HashSplit.bucket($"doc_id", 100)
    val rate = when($"lang" === "en", 20).otherwise(50)
    t(s, dir, "documents")
      .select($"doc_id", $"lang", b.as("bucket"), rate.as("rate"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_total"),
        count(when($"bucket" < $"rate", 1)).as("n_sampled"),
        sum(when($"bucket" < $"rate", $"doc_id")).as("sampled_id_sum"))
      .orderBy($"lang")
  }

  val q54Sql: String = {
    def hexVal(i: Int) =
      s"""(CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) >= 97
         | THEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 87
         | ELSE ascii(substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 48 END)""".stripMargin
    // first 8 hex chars as a BIGINT (Horner), matching HashSplit.bucket
    val hex8 = (1 to 8).foldLeft("CAST(0 AS BIGINT)")(
      (acc, i) => s"($acc * 16 + ${hexVal(i)})")
    s"""WITH b AS (SELECT doc_id, lang,
       |  $hex8 % 100 AS bucket,
       |  CASE WHEN lang = 'en' THEN 20 ELSE 50 END AS rate
       |  FROM documents)
       |SELECT lang, count(*) AS n_total,
       |       count(CASE WHEN bucket < rate THEN 1 END) AS n_sampled,
       |       CAST(sum(CASE WHEN bucket < rate THEN doc_id END) AS BIGINT)
       |         AS sampled_id_sum
       |FROM b GROUP BY lang ORDER BY lang""".stripMargin
  }

  // --------------------------------------------------------------------
  // q55 — bigram frequency (n-gram language-model counts): word 2-grams
  // via the shared shingling machinery, top-20. Same partial-agg +
  // top-k shape as q44.
  def q55(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .withColumn("toks", TextFns.tokens($"text"))
      .select(explode(TextFns.ngramsFromTokens($"toks", 2)).as("bigram"))
      .groupBy($"bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"bigram".asc)
      .limit(20)
  }

  val q55Sql: String = {
    val toks = """regexp_split_to_array(trim(text), '\s+')"""
    s"""SELECT bigram, count(*) AS n
       |FROM (SELECT unnest(list_transform(
       |    generate_series(1, greatest(len($toks) - 1, 1)),
       |    i -> array_to_string(list_slice($toks, i, i + 1), ' '))) AS bigram
       |  FROM documents) x
       |GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin
  }

  // --------------------------------------------------------------------
  // q56 — vocabulary coverage / OOV rate per document: build the top-50
  // corpus vocabulary, broadcast it, count each doc's out-of-vocabulary
  // tokens. The standard "does this doc look like the training
  // distribution" filter. Scale: vocab is tiny (broadcast); the token
  // stream never shuffles except the per-doc count agg.
  def q56(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select($"doc_id", explode(TextFns.tokens($"text")).as("word"))
    val vocab = toks.groupBy($"word").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"word".asc).limit(50)
      .select($"word", lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("word"), "left")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when($"in_vocab".isNull, 1)).as("n_oov"))
      .orderBy($"doc_id")
  }

  val q56Sql: String =
    """WITH toks AS (SELECT doc_id,
      |    unnest(regexp_split_to_array(trim(text), '\s+')) AS word
      |  FROM documents),
      | vocab AS (SELECT word FROM (
      |    SELECT word, count(*) AS n FROM toks GROUP BY 1
      |    ORDER BY n DESC, word ASC LIMIT 50))
      |SELECT t.doc_id, count(*) AS n_tokens,
      |       count(CASE WHEN v.word IS NULL THEN 1 END) AS n_oov
      |FROM toks t LEFT JOIN vocab v ON t.word = v.word
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q57 — per-label embedding centroids (the building block of k-means /
  // IVF training and of class-prototype classifiers): component means in
  // one hash agg. At 10^9 vectors this is a partial+final agg of
  // per-component sums — no collect, no iteration. Round-half-up via
  // floor(x*1000+0.5) so both engines round the identical IEEE double.
  def q57(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def c(i: Int) =
      (floor(avg(element_at($"embedding", i)) * 1000 + lit(0.5)) / 1000)
        .as(s"c$i")
    t(s, dir, "embeddings")
      .groupBy($"label")
      .agg(count(lit(1)).as("n"), c(1), c(2), c(3), c(4))
      .orderBy($"label")
  }

  val q57Sql: String = {
    def c(i: Int) =
      s"floor(avg(embedding[$i]) * 1000 + 0.5) / 1000 AS c$i"
    s"""SELECT label, count(*) AS n, ${c(1)}, ${c(2)}, ${c(3)}, ${c(4)}
       |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
  }

  // --------------------------------------------------------------------
  // q58 — left-semi join (existence filter without duplication or
  // payload): completes the join-type inventory next to q03 (left),
  // q04/q30 (full outer), q05 (anti), q23 (cross). Same scale shape as
  // the anti join: shuffles only keys.
  def q58(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter($"o_totalprice" > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val q58Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_totalprice > 400000 AND o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------------
  // q59 — interval (range) join: events against a small campaign-window
  // dimension, ON day BETWEEN start AND end — a genuine non-equi join
  // (q36's time buckets are equi by construction; this one has
  // OVERLAPPING intervals, so an event can match several campaigns).
  // Scale: the interval dim is tiny => broadcast nested-loop, the fact
  // side streams through codegen'd predicates with no shuffle. For a
  // LARGE interval dim the plan changes to bucketed overlap join —
  // documented, not needed here.
  def q59(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val campaigns = Seq(
      ("new_year", "2024-01-01", "2024-01-07"),
      ("mid_month", "2024-01-10", "2024-01-14"),
      ("payday", "2024-01-12", "2024-01-16"), // overlaps mid_month
      ("closeout", "2024-01-25", "2024-01-31")
    ).toDF("campaign", "s", "e")
      .select($"campaign", to_date($"s").as("start_day"),
        to_date($"e").as("end_day"))
    t(s, dir, "events")
      .join(broadcast(campaigns),
        to_date($"ts").between($"start_day", $"end_day"))
      .groupBy($"campaign")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"campaign")
  }

  val q59Sql: String =
    """WITH campaigns(campaign, start_day, end_day) AS (VALUES
      |  ('new_year', DATE '2024-01-01', DATE '2024-01-07'),
      |  ('mid_month', DATE '2024-01-10', DATE '2024-01-14'),
      |  ('payday', DATE '2024-01-12', DATE '2024-01-16'),
      |  ('closeout', DATE '2024-01-25', DATE '2024-01-31'))
      |SELECT campaign, count(*) AS n_events,
      |       count(DISTINCT user_id) AS n_users
      |FROM events JOIN campaigns
      |  ON CAST(ts AS DATE) BETWEEN start_day AND end_day
      |GROUP BY campaign ORDER BY campaign""".stripMargin

  // --------------------------------------------------------------------
  // q60 — the SAME as-of semantics as q39 through the NATIVE operator
  // (graft.plans.AsOfJoinExec: logical node → strategy → merge-sweep
  // physical plan, SURVEY.md §4.3 rung c). Hash-checked against the
  // identical oracle SQL, so both formulations are proven equivalent by
  // the gate itself.
  def q60(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id",
        $"ts".as("purchase_ts"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id", $"value")
    graft.plans.AsOfJoinNative.backward(purchases, clicks,
        keyCols = Seq("user_id"), leftTime = "purchase_ts", rightTime = "ts",
        prefix = "click_")
      .select($"purchase_id", $"user_id", $"purchase_ts",
        $"click_event_id".as("click_id"), $"click_ts", $"click_value")
      .orderBy($"purchase_id")
  }

  val q60Sql: String = q39Sql

  // --------------------------------------------------------------------
  // q62 — table profiling (graft.ext.Profile): per-column quality stats
  // in one shuffle — the pre-ingestion sanity pass. String min/max are
  // lexicographic by contract; distinct is exact here, HLL at scale.
  def q62(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.ext.Profile
      .profile(t(s, dir, "events"), Seq("event_type", "user_id", "props"))
      .orderBy($"col_name")
  }

  val q62Sql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         | count(CASE WHEN $c IS NULL THEN 1 END) AS n_null,
         | count(DISTINCT CAST($c AS VARCHAR)) AS n_distinct,
         | min(CAST($c AS VARCHAR)) AS min_str,
         | max(CAST($c AS VARCHAR)) AS max_str
         |FROM events""".stripMargin
    s"""${one("event_type")}
       |UNION ALL
       |${one("user_id")}
       |UNION ALL
       |${one("props")}
       |ORDER BY col_name""".stripMargin
  }

  // --------------------------------------------------------------------
  // q63 — session windows via Spark's built-in session_window (dynamic-
  // gap event-time windows, the streaming-native formulation of q38's
  // manual sessionization; same definition runs under a watermark in a
  // stream — see StreamingSpec). Boundary semantics: an event exactly
  // `gap` after the previous one starts a NEW session (window end is
  // exclusive), hence >= in the oracle's lag formulation.
  def q63(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("session_start"),
        $"w.end".as("session_end"), $"n_events")
      .orderBy($"user_id", $"session_start")
  }

  val q63Sql: String =
    """WITH x AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
      |    THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      | s AS (
      |  SELECT user_id, ts,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |                      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x)
      |SELECT user_id, min(ts) AS session_start,
      |       max(ts) + INTERVAL 30 MINUTE AS session_end,
      |       count(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // --------------------------------------------------------------------
  // q64 — multimodal feature extraction (graft.ext.Multimodal.features):
  // payload → fixed-dim float vector through the partition-parallel
  // operator, components oracle-checked exactly (codepoints are
  // float-exact). This is the bridge stage from the media store into
  // the ANN path (q23/q25/q49 consume such vectors).
  def q64(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = graft.ext.Multimodal
      .mediaFromDocuments(s, t(s, dir, "documents"))
    graft.ext.Multimodal.features(media, dim = 4).toDF()
      .select($"media_id",
        element_at($"feature", 1).cast("int").as("f1"),
        element_at($"feature", 2).cast("int").as("f2"),
        element_at($"feature", 3).cast("int").as("f3"),
        element_at($"feature", 4).cast("int").as("f4"))
      .orderBy($"media_id")
  }

  val q64Sql: String = {
    def f(i: Int) = {
      val pos = i * 7 + 1
      s"""CAST(CASE WHEN length(text) > ${i * 7}
         | THEN ascii(substr(text, $pos, 1)) ELSE 0 END AS INTEGER)
         | AS f${i + 1}""".stripMargin
    }
    s"""SELECT doc_id AS media_id, ${f(0)}, ${f(1)}, ${f(2)}, ${f(3)}
       |FROM documents ORDER BY media_id""".stripMargin
  }

  // --------------------------------------------------------------------
  // q65 — salted join (graft.functions.Skew.saltedJoin): the hot-key
  // spread for joins AQE can't re-plan, proven result-identical to the
  // plain join by the oracle. The dim side is replicated saltFactor×
  // (keep it broadcast-sized); the skewed key spreads over saltFactor
  // reducers.
  def q65(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = Seq(
      ("click", "engage"), ("view", "engage"),
      ("purchase", "convert"), ("signup", "convert"), ("error", "ops")
    ).toDF("event_type", "category")
    graft.functions.Skew
      .saltedJoin(t(s, dir, "events"), dim, "event_type", n = 8)
      .groupBy($"category")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"category")
  }

  val q65Sql: String =
    """WITH dim(event_type, category) AS (VALUES
      |  ('click', 'engage'), ('view', 'engage'),
      |  ('purchase', 'convert'), ('signup', 'convert'), ('error', 'ops'))
      |SELECT category, count(*) AS n_events,
      |       count(DISTINCT user_id) AS n_users
      |FROM events JOIN dim USING (event_type)
      |GROUP BY category ORDER BY category""".stripMargin

  // --------------------------------------------------------------------
  // q66 — salted holistic aggregation (Skew.saltedCollectList): two-stage
  // collect for aggregates whose partial state doesn't shrink; the
  // oracle checks the per-key MULTISET via an order-insensitive digest
  // (md5 of the sorted list), proving the salt+merge loses nothing.
  def q66(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Skew
      .saltedCollectList(
        t(s, dir, "events").filter($"user_id" < 10)
          .select($"user_id", $"event_id"),
        "user_id", "event_id", n = 8)
      .select($"user_id",
        size($"event_id_list").as("n"),
        md5(concat_ws(",",
          sort_array($"event_id_list").cast("array<string>"))).as("digest"))
      .orderBy($"user_id")
  }

  val q66Sql: String =
    """SELECT user_id, CAST(len(list(event_id)) AS INTEGER) AS n,
      | md5(array_to_string(list_sort(list(event_id)), ',')) AS digest
      |FROM events WHERE user_id < 10
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------------
  // q67 — the remaining window-function family in one pass: lead,
  // first_value (explicit ROWS frame), ntile. Same single key shuffle
  // as q16/q51.
  def q67(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    t(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .withColumn("first_type", first($"event_type")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("quartile", ntile(4).over(w))
      .orderBy($"user_id", $"event_id")
  }

  val q67Sql: String =
    """SELECT user_id, event_id, event_type,
      | lead(event_type) OVER w AS next_type,
      | first_value(event_type) OVER (PARTITION BY user_id ORDER BY event_id
      |   ROWS UNBOUNDED PRECEDING) AS first_type,
      | ntile(4) OVER w AS quartile
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      |ORDER BY user_id, event_id""".stripMargin

  // --------------------------------------------------------------------
  // q68 — INTERSECT / EXCEPT set semantics (the reference only has
  // UNION, U1): converting users vs click-only users, tagged in one
  // result. Both compile to aggregated semi/anti joins.
  def q68(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val clickers = ev.filter($"event_type" === "click").select($"user_id")
    val buyers = ev.filter($"event_type" === "purchase").select($"user_id")
    clickers.intersect(buyers).withColumn("grp", lit("click_and_buy"))
      .union(clickers.except(buyers).withColumn("grp", lit("click_only")))
      .select($"grp", $"user_id")
      .orderBy($"grp", $"user_id")
  }

  val q68Sql: String =
    """SELECT 'click_and_buy' AS grp, user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'click'
      |  INTERSECT
      |  SELECT user_id FROM events WHERE event_type = 'purchase')
      |UNION ALL
      |SELECT 'click_only', user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'click'
      |  EXCEPT
      |  SELECT user_id FROM events WHERE event_type = 'purchase')
      |ORDER BY grp, user_id""".stripMargin

  // --------------------------------------------------------------------
  // q69 — correlated subquery through the SQL surface (spark.sql over a
  // registered view): events whose value beats the same user's best
  // click (max — exact in both engines; an avg here would be a
  // float-summation knife edge). Catalyst decorrelates this into a
  // join + aggregate automatically.
  def q69(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events").createOrReplaceTempView("ev_q69")
    s.sql(
      """SELECT event_id, user_id, event_type,
        |       CAST(floor(value) AS INT) AS v
        |FROM ev_q69 e
        |WHERE value > (SELECT max(value) FROM ev_q69
        |               WHERE user_id = e.user_id AND event_type = 'click')
        |ORDER BY event_id""".stripMargin)
  }

  val q69Sql: String =
    """SELECT event_id, user_id, event_type,
      | CAST(floor(value) AS INTEGER) AS v
      |FROM events e
      |WHERE value > (SELECT max(value) FROM events
      |               WHERE user_id = e.user_id AND event_type = 'click')
      |ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------------
  // q70 — posexplode (generator with ordinality) over embeddings: the
  // row-to-component layout used for columnar vector analytics.
  // float→double casts are bit-exact.
  def q70(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "embeddings")
      .filter($"vec_id" < 10)
      .select($"vec_id", posexplode($"embedding"))
      .select($"vec_id", $"pos", $"col".cast("double").as("component"))
      .orderBy($"vec_id", $"pos")
  }

  val q70Sql: String =
    """SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS component
      |FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
      |WHERE vec_id < 10
      |ORDER BY vec_id, pos""".stripMargin

  // --------------------------------------------------------------------
  // q71 — fuzzy string matching via edit distance (levenshtein): the
  // canonical-entity pass (near-identical source/station names). Pairs
  // over the DISTINCT values only — the dimension is small after
  // dedup, so the quadratic stays tiny even at corpus scale.
  def q71(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = t(s, dir, "documents").select($"source").distinct()
    val a = src.select($"source".as("src_a"))
    val b = src.select($"source".as("src_b"))
    a.crossJoin(b)
      .filter($"src_a" < $"src_b")
      .withColumn("dist", levenshtein($"src_a", $"src_b"))
      .filter($"dist" <= 1)
      .orderBy($"src_a", $"src_b")
  }

  val q71Sql: String =
    """WITH s AS (SELECT DISTINCT source FROM documents)
      |SELECT a.source AS src_a, b.source AS src_b,
      |       CAST(levenshtein(a.source, b.source) AS INTEGER) AS dist
      |FROM s a JOIN s b ON a.source < b.source
      |WHERE levenshtein(a.source, b.source) <= 1
      |ORDER BY src_a, src_b""".stripMargin

  // --------------------------------------------------------------------
  // q72 — regex extraction + occurrence counting (the C7 filename-regex
  // family generalized): first numeric token and digit-run count per
  // props payload. Spark's Java regex and DuckDB's RE2 agree on this
  // dialect-neutral pattern; no-match extract is '' in both.
  def q72(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_id",
        regexp_extract($"props", "([0-9]+)", 1).as("first_num"),
        expr("regexp_count(props, '[0-9]+')").cast("int").as("n_nums"))
      .orderBy($"event_id")
  }

  val q72Sql: String =
    """SELECT event_id,
      | regexp_extract(props, '([0-9]+)', 1) AS first_num,
      | CAST(len(regexp_extract_all(props, '[0-9]+')) AS INTEGER) AS n_nums
      |FROM events ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------------
  // q73 — date arithmetic family (C2–C4 generalized): week truncation
  // (Monday start in both engines), month end, day-offset-in-month,
  // date addition. All scalar, codegen'd, scan-side.
  def q73(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_id",
        to_date(date_trunc("week", $"ts")).as("week_start"),
        last_day($"ts").as("month_end"),
        datediff(to_date($"ts"), to_date(date_trunc("month", $"ts")))
          .as("day_of_month0"),
        date_add(to_date($"ts"), 7).as("plus7"))
      .orderBy($"event_id")
  }

  val q73Sql: String =
    """SELECT event_id,
      | CAST(date_trunc('week', ts) AS DATE) AS week_start,
      | last_day(ts) AS month_end,
      | CAST(date_diff('day', date_trunc('month', ts), CAST(ts AS DATE))
      |   AS INTEGER) AS day_of_month0,
      | CAST(ts AS DATE) + 7 AS plus7
      |FROM events ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------------
  // q74 — RANGE window frame over event time (trailing 1-hour velocity
  // per user): the rate/feature-engineering window that ROWS frames
  // can't express (the frame is a TIME span, not a row count). Spark
  // range frames need a numeric order key — epoch seconds — which is
  // exactly DuckDB's RANGE INTERVAL semantics on the raw timestamp.
  def q74(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_timestamp($"ts"))
      .rangeBetween(-3600, 0)
    t(s, dir, "events")
      .select($"user_id", $"event_id", $"ts")
      .withColumn("events_last_hour", count(lit(1)).over(w))
      .orderBy($"user_id", $"event_id")
  }

  val q74Sql: String =
    """SELECT user_id, event_id, ts,
      | count(*) OVER (PARTITION BY user_id
      |   ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |   AS events_last_hour
      |FROM events ORDER BY user_id, event_id""".stripMargin

  // --------------------------------------------------------------------
  // q75 — unpivot (wide → long, the inverse of q43's pivot): melts the
  // daily matrix back to (day, event_type, n), keeping explicit zeros —
  // the normalization step before joins/aggs over pivoted exports.
  // Compiles to Expand (one pass, no shuffle beyond q43's agg).
  def q75(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    q43(s, dir) // reuses the pivot query (already day-sorted)
      .unpivot(Array($"day"), types.map(col).toArray, "event_type", "n")
      .orderBy($"day", $"event_type")
  }

  val q75Sql: String =
    """WITH w AS (SELECT CAST(ts AS DATE) AS day,
      |   count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |   count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      |   count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |   count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |   count(CASE WHEN event_type = 'view' THEN 1 END) AS view
      | FROM events GROUP BY 1)
      |UNPIVOT w ON click, error, purchase, signup, view
      |INTO NAME event_type VALUE n
      |ORDER BY day, event_type""".stripMargin

  // --------------------------------------------------------------------
  // q76 — percent-of-total via an EMPTY window frame (sum over the whole
  // result): the share-of-traffic analytics shape. The global window
  // runs over the already-aggregated group rows (|types| rows), so the
  // single-partition window is trivially cheap at any scale.
  def q76(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byType = t(s, dir, "events")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"))
    byType
      .withColumn("total", sum($"n").over(Window.partitionBy()))
      .select($"event_type", $"n",
        (floor($"n" * 10000.0 / $"total" + 0.5) / 100).as("pct"))
      .orderBy($"event_type")
  }

  val q76Sql: String =
    """SELECT event_type, n,
      | floor(n * 10000.0 / sum(n) OVER () + 0.5) / 100 AS pct
      |FROM (SELECT event_type, count(*) AS n FROM events GROUP BY 1) x
      |ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------
  // q77 — median absolute deviation per group (robust outlier stats):
  // exact median, broadcast it back, exact median of absolute
  // deviations. Integer inputs keep both interpolations IEEE-exact
  // (half- and quarter-integers). The two-pass + broadcast layout is
  // the scalable exact formulation; sketches replace both passes at
  // the 100 TB tier.
  def q77(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val iv = t(s, dir, "events")
      .select($"event_type", floor($"value").cast("int").as("iv"))
    val med = iv.groupBy($"event_type")
      .agg(expr("percentile(iv, 0.5)").as("median"))
    iv.join(broadcast(med), Seq("event_type"))
      .select($"event_type", $"median", abs($"iv" - $"median").as("ad"))
      .groupBy($"event_type")
      .agg(first($"median").as("median"),
        expr("percentile(ad, 0.5)").as("mad"))
      .orderBy($"event_type")
  }

  val q77Sql: String =
    """WITH iv AS (SELECT event_type, CAST(floor(value) AS INTEGER) AS iv
      |            FROM events),
      | med AS (SELECT event_type, quantile_cont(iv, 0.5) AS median
      |         FROM iv GROUP BY 1)
      |SELECT iv.event_type, any_value(median) AS median,
      |       quantile_cont(abs(iv - median), 0.5) AS mad
      |FROM iv JOIN med USING (event_type)
      |GROUP BY iv.event_type ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------
  // q78 — LIMIT/OFFSET pagination over a deterministic global sort: the
  // API-serving shape. Spark plans limit+offset as a single
  // CollectLimit with skip — no full materialization of earlier pages.
  def q78(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_id", $"user_id", floor($"value").cast("long").as("v"))
      .orderBy($"v".desc, $"event_id".asc)
      .offset(40)
      .limit(20)
  }

  val q78Sql: String =
    """SELECT event_id, user_id, CAST(floor(value) AS BIGINT) AS v
      |FROM events ORDER BY v DESC, event_id ASC
      |LIMIT 20 OFFSET 40""".stripMargin

  /** Name → query function, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_sessionize" -> (q38 _),
    "q39_asof_join" -> (q39 _),
    "q40_rollup" -> (q40 _),
    "q41_percentiles" -> (q41 _),
    "q42_topk_per_group" -> (q42 _),
    "q43_pivot" -> (q43 _),
    "q44_word_freq" -> (q44 _),
    "q45_hash_split" -> (q45 _),
    "q46_dedup_keep_best" -> (q46 _),
    "q47_simhash_pairs" -> (q47 _),
    "q48_multi_distinct" -> (q48 _),
    "q49_ivf_ann" -> (q49 _),
    "q50_frame_sample" -> (q50 _),
    "q51_window_frames" -> (q51 _),
    "q52_cube" -> (q52 _),
    "q53_distinctive_terms" -> (q53 _),
    "q54_stratified_sample" -> (q54 _),
    "q55_bigram_freq" -> (q55 _),
    "q56_vocab_oov" -> (q56 _),
    "q57_label_centroids" -> (q57 _),
    "q58_semi_join" -> (q58 _),
    "q59_interval_join" -> (q59 _),
    "q60_asof_native" -> (q60 _),
    "q62_profile" -> (q62 _),
    "q63_session_window" -> (q63 _),
    "q64_media_features" -> (q64 _),
    "q65_salted_join" -> (q65 _),
    "q66_salted_holistic" -> (q66 _),
    "q67_window_functions" -> (q67 _),
    "q68_intersect_except" -> (q68 _),
    "q69_correlated_subquery" -> (q69 _),
    "q70_posexplode" -> (q70 _),
    "q71_fuzzy_match" -> (q71 _),
    "q72_regexp_extract" -> (q72 _),
    "q73_date_math" -> (q73 _),
    "q74_range_frame" -> (q74 _),
    "q75_unpivot" -> (q75 _),
    "q76_pct_of_total" -> (q76 _),
    "q77_mad_outliers" -> (q77 _),
    "q78_pagination" -> (q78 _)
  )

  /** Name → DuckDB oracle SQL. */
  val oracles: Map[String, String] = Map(
    "q49_ivf_ann" -> q49Sql,
    "q38_sessionize" -> q38Sql,
    "q39_asof_join" -> q39Sql,
    "q40_rollup" -> q40Sql,
    "q41_percentiles" -> q41Sql,
    "q42_topk_per_group" -> q42Sql,
    "q43_pivot" -> q43Sql,
    "q44_word_freq" -> q44Sql,
    "q45_hash_split" -> q45Sql,
    "q46_dedup_keep_best" -> q46Sql,
    "q47_simhash_pairs" -> q47Sql,
    "q48_multi_distinct" -> q48Sql,
    "q50_frame_sample" -> q50Sql,
    "q51_window_frames" -> q51Sql,
    "q52_cube" -> q52Sql,
    "q53_distinctive_terms" -> q53Sql,
    "q54_stratified_sample" -> q54Sql,
    "q55_bigram_freq" -> q55Sql,
    "q56_vocab_oov" -> q56Sql,
    "q57_label_centroids" -> q57Sql,
    "q58_semi_join" -> q58Sql,
    "q59_interval_join" -> q59Sql,
    "q60_asof_native" -> q60Sql,
    "q62_profile" -> q62Sql,
    "q63_session_window" -> q63Sql,
    "q64_media_features" -> q64Sql,
    "q65_salted_join" -> q65Sql,
    "q66_salted_holistic" -> q66Sql,
    "q67_window_functions" -> q67Sql,
    "q68_intersect_except" -> q68Sql,
    "q69_correlated_subquery" -> q69Sql,
    "q70_posexplode" -> q70Sql,
    "q71_fuzzy_match" -> q71Sql,
    "q72_regexp_extract" -> q72Sql,
    "q73_date_math" -> q73Sql,
    "q74_range_frame" -> q74Sql,
    "q75_unpivot" -> q75Sql,
    "q76_pct_of_total" -> q76Sql,
    "q77_mad_outliers" -> q77Sql,
    "q78_pagination" -> q78Sql
  )
}
