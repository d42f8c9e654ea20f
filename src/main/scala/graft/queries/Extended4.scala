package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Round-4 extension queries: the remaining SQL-surface rungs (LATERAL
  * joins, try_* defensive arithmetic, bitmap-index distinct counting,
  * array-function kitchen sink) plus the analytics/retrieval operators a
  * training-data platform runs at corpus scale (exact-integer regression
  * panel, BM25 ranked retrieval over the inverted index, conversion
  * funnels).
  *
  * Numeric-parity doctrine (NOTES.md): every cross-row accumulation that
  * feeds a rounded output is kept INTEGER/DECIMAL-exact (scaled by 1e6
  * via floor, summed as BIGINT/DECIMAL(38,0)), and doubles only appear in
  * the FINAL per-group derivation where both engines evaluate the same
  * expression over the same exact inputs.
  */
object Extended4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val tokensSql = """regexp_split_to_array(trim(text), '\s+')"""

  // --------------------------------------------------------------------
  // q106 — LATERAL correlated subquery join (top-3 orders per customer).
  // The per-key-top-k shape as a LATERAL subquery: Catalyst decorrelates
  // it into a ranked join rather than running the inner query per row —
  // the plan is the same window/join you would hand-write, so the SQL
  // surface costs nothing at scale. Only low-key customers to keep the
  // verified output focused; the decorrelated plan is key-count-agnostic.
  def q106(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("cust_q106")
    t(s, dir, "orders").createOrReplaceTempView("ord_q106")
    s.sql(
      """SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        |FROM cust_q106 c,
        | LATERAL (SELECT o_orderkey, o_totalprice
        |          FROM ord_q106 o
        |          WHERE o.o_custkey = c.c_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey
        |          LIMIT 3) t
        |WHERE c.c_custkey <= 100
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
  }

  val q106Sql: String =
    """SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      | LATERAL (SELECT o_orderkey, o_totalprice
      |          FROM orders o
      |          WHERE o.o_custkey = c.c_custkey
      |          ORDER BY o_totalprice DESC, o_orderkey
      |          LIMIT 3) t
      |WHERE c.c_custkey <= 100
      |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin

  // --------------------------------------------------------------------
  // q107 — array-function kitchen sink over document tokens: sequence,
  // slice, flatten, zip_with, array_sort/distinct/position, aggregate.
  // All per-row scalar HOFs — no shuffle, whole-stage-codegen'd, scan
  // bound at any corpus size. Array outputs are joined to strings so the
  // comparison is representation-stable across engines.
  def q107(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .withColumn("toks", TextFns.tokens($"text"))
      .withColumn("head3", slice($"toks", 1, 3))
      .select(
        $"doc_id",
        array_join(slice(array_sort(array_distinct($"toks")), 1, 5), " ")
          .as("vocab5"),
        array_join(
          zip_with($"head3", transform($"head3", x => length(x)),
            (a, b) => concat(a, lit(":"), b)), " ").as("head3_len"),
        array_position($"toks", "the").as("first_the"),
        aggregate(sequence(lit(1), size($"toks")), lit(0L),
          (acc, x) => acc + x).as("pos_sum"),
        array_join(flatten(array(slice($"toks", 1, 2),
          slice(reverse($"toks"), 1, 2))), " ").as("ends4"))
      .orderBy($"doc_id")
  }

  val q107Sql: String =
    s"""WITH d AS (SELECT doc_id, $tokensSql AS toks FROM documents),
       | e AS (SELECT doc_id, toks, list_slice(toks, 1, 3) AS head3
       |       FROM d)
       |SELECT doc_id,
       | array_to_string(list_slice(list_sort(list_distinct(toks)), 1, 5), ' ')
       |   AS vocab5,
       | array_to_string(list_transform(
       |     list_zip(head3, list_transform(head3, x -> length(x))),
       |     p -> p[1] || ':' || p[2]), ' ') AS head3_len,
       | CAST(coalesce(list_position(toks, 'the'), 0) AS BIGINT) AS first_the,
       | CAST(len(toks) * (len(toks) + 1) / 2 AS BIGINT) AS pos_sum,
       | array_to_string(list_concat(list_slice(toks, 1, 2),
       |     list_slice(list_reverse(toks), 1, 2)), ' ') AS ends4
       |FROM e ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q108 — correlation / least-squares regression panel per event type:
  // value (scaled to integer millionths via floor — exact on both
  // engines) against hour-of-day. The five sufficient statistics (n, Σh,
  // Σv, Σhv, Σh², Σv²) are accumulated as BIGINT/DECIMAL(38,0), so
  // partial-aggregation order cannot perturb them; Pearson r, slope,
  // intercept and sample stddev derive from the exact sums in ONE final
  // double expression per group. This is the sufficient-statistics
  // pattern every distributed regression uses: the shuffle carries six
  // numbers per group, never the rows.
  def q108(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .select($"event_type",
        hour($"ts".cast("timestamp")).cast("long").as("h"),
        floor($"value" * lit(1000000.0)).as("v"))
    val sums = ev.groupBy($"event_type").agg(
      count(lit(1)).as("n"),
      sum($"h").as("sh"), sum($"v").as("sv"),
      sum($"h" * $"v").as("shv"),
      sum(($"h" * $"h").cast("decimal(38,0)")).as("sh2"),
      sum(($"v" * $"v").cast("decimal(38,0)")).as("sv2"))
    val n = $"n".cast("double"); val sh = $"sh".cast("double")
    val sv = $"sv".cast("double"); val shv = $"shv".cast("double")
    val sh2 = $"sh2".cast("double"); val sv2 = $"sv2".cast("double")
    def r6(c: Column) = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val covn = n * shv - sh * sv
    val varh = n * sh2 - sh * sh
    val varv = n * sv2 - sv * sv
    sums.select(
      $"event_type", $"n",
      r6(covn / sqrt(varh * varv)).as("corr_r"),
      r6(covn / varh / lit(1000000.0)).as("slope_r"),
      r6((sv / n - (covn / varh) * (sh / n)) / lit(1000000.0)).as("intercept_r"),
      r6(sqrt(varv / (n * (n - lit(1.0)))) / lit(1000000.0)).as("std_v"))
      .orderBy($"event_type")
  }

  val q108Sql: String =
    """WITH e AS (SELECT event_type,
      |    CAST(extract(hour FROM ts) AS BIGINT) AS h,
      |    CAST(floor(value * 1000000.0) AS BIGINT) AS v
      |  FROM events),
      | s AS (SELECT event_type, count(*) AS n,
      |    sum(h) AS sh, sum(v) AS sv, sum(h * v) AS shv,
      |    sum(CAST(h * h AS DECIMAL(38,0))) AS sh2,
      |    sum(CAST(v * v AS DECIMAL(38,0))) AS sv2
      |  FROM e GROUP BY 1),
      | d AS (SELECT event_type, n,
      |    CAST(n AS DOUBLE) AS nd, CAST(sh AS DOUBLE) AS shd,
      |    CAST(sv AS DOUBLE) AS svd, CAST(shv AS DOUBLE) AS shvd,
      |    CAST(sh2 AS DOUBLE) AS sh2d, CAST(sv2 AS DOUBLE) AS sv2d
      |  FROM s)
      |SELECT event_type, n,
      | floor((nd*shvd - shd*svd) / sqrt((nd*sh2d - shd*shd)*(nd*sv2d - svd*svd))
      |   * 1000000.0 + 0.5) / 1000000.0 AS corr_r,
      | floor((nd*shvd - shd*svd) / (nd*sh2d - shd*shd) / 1000000.0
      |   * 1000000.0 + 0.5) / 1000000.0 AS slope_r,
      | floor((svd/nd - ((nd*shvd - shd*svd) / (nd*sh2d - shd*shd)) * (shd/nd))
      |   / 1000000.0 * 1000000.0 + 0.5) / 1000000.0 AS intercept_r,
      | floor(sqrt((nd*sv2d - svd*svd) / (nd*(nd - 1.0))) / 1000000.0
      |   * 1000000.0 + 0.5) / 1000000.0 AS std_v
      |FROM d ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------
  // q109 — defensive arithmetic (try_cast / try_divide / try_element_at):
  // the dirty-data discipline for petabyte ingests — malformed values
  // become NULL inside the plan instead of failing the job 90 minutes in.
  // Each try_* stays codegen'd; none fall back to UDFs. The oracle pins
  // the exact NULL semantics (DuckDB: TRY_CAST + nullif guards).
  //
  // Scale note (measured): try_cast on a string that ISN'T numeric
  // throws+catches a JVM exception per row — 0.92 s vs 0.20 s base for
  // 100k rows when every row is malformed. On a mostly-dirty feed,
  // pre-guard the cast with a cheap character-class regex (below,
  // bad_num) so the exception path never runs; the guard returns NULL
  // exactly where try_cast would. try_cast stays the right tool when
  // values are mostly parseable (k_num).
  def q109(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("h", hour($"ts".cast("timestamp")))
      .select(
        $"event_id",
        expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("k_num"),
        expr("try_divide(value, cast(h - 12 AS DOUBLE))").as("per_off_hour"),
        expr("""CASE WHEN substring(event_type, 1, 1) RLIKE '^[+-]?[0-9]+$'
                THEN try_cast(substring(event_type, 1, 1) AS BIGINT) END""")
          .as("bad_num"),
        expr("try_element_at(split(event_type, ''), 100)").as("char100"),
        expr("try_cast(concat('20', lpad(cast(h AS STRING), 2, '0'), '-01-01') AS DATE)")
          .cast("string").as("fake_date"))
      .orderBy($"event_id")
  }

  val q109Sql: String =
    """SELECT event_id,
      | TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
      | value / nullif(CAST(extract(hour FROM ts) - 12 AS DOUBLE), 0.0)
      |   AS per_off_hour,
      | TRY_CAST(substring(event_type, 1, 1) AS BIGINT) AS bad_num,
      | string_split(event_type, '')[100] AS char100,
      | CAST(TRY_CAST('20' || lpad(CAST(extract(hour FROM ts) AS VARCHAR), 2, '0')
      |   || '-01-01' AS DATE) AS VARCHAR) AS fake_date
      |FROM events ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------------
  // q110 — EXACT distinct counting via roaring-style bitmaps
  // (bitmap_bucket_number / bitmap_construct_agg / bitmap_count): the
  // mergeable-exact alternative to approx_count_distinct. Each
  // (group, bucket) builds a fixed-size bitmap in the partial aggregate;
  // counts add across buckets because buckets partition the key space.
  // At 100 TB this is the pattern for pre-aggregated distinct-user cubes:
  // bitmaps union incrementally (bitmap_or_agg) without re-scanning
  // history, unlike a COUNT(DISTINCT) which must always re-shuffle raw
  // keys. Oracle = plain exact COUNT(DISTINCT) — the bitmap path must
  // reproduce it bit-for-bit.
  def q110(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events").createOrReplaceTempView("ev_q110")
    s.sql(
      """WITH buckets AS (
        |  SELECT event_type, bitmap_bucket_number(user_id) AS bkt,
        |         bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
        |  FROM ev_q110 GROUP BY 1, 2)
        |SELECT event_type,
        |       CAST(sum(bitmap_count(bm)) AS BIGINT) AS distinct_users,
        |       count(*) AS n_buckets
        |FROM buckets GROUP BY 1 ORDER BY event_type""".stripMargin)
  }

  val q110Sql: String =
    """WITH buckets AS (
      |  SELECT event_type,
      |         CASE WHEN user_id > 0 THEN (user_id - 1) // 32768 + 1
      |              ELSE user_id // 32768 END AS bkt,
      |         count(DISTINCT user_id) AS du
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, CAST(sum(du) AS BIGINT) AS distinct_users,
      |       count(*) AS n_buckets
      |FROM buckets GROUP BY 1 ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------
  // q111 — BM25 ranked retrieval (k1=1.2, b=0.75) over the q82 inverted
  // index shape: tf from an explode+agg, df from the postings, dl/avgdl
  // from per-doc token counts. Per-(doc,term) scores are computed in ONE
  // deterministic double expression from exact integer inputs, scaled to
  // nano-units with floor, and summed as BIGINT — so the cross-term sum
  // is aggregation-order-proof (NOTES.md doctrine). The only libm call is
  // ln() over the handful of distinct (N, df) pairs; the gate verifies
  // JVM/DuckDB agreement on those exact inputs. Term side is tiny and
  // broadcast; the tf join shuffles on term like any search engine's
  // postings merge.
  def q111(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qTerms = Seq("the", "data", "model", "system")
    val docs = t(s, dir, "documents")
      .select($"doc_id", TextFns.tokens($"text").as("toks"))
      .select($"doc_id", $"toks", size($"toks").cast("long").as("dl"))
    val corpus = docs.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    val tf = docs
      .select($"doc_id", $"dl", explode($"toks").as("term"))
      .filter($"term".isin(qTerms: _*))
      .groupBy($"doc_id", $"dl", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(countDistinct($"doc_id").as("df"))
    val scored = tf.join(broadcast(df), "term").crossJoin(broadcast(corpus))
      .withColumn("avgdl", $"sum_dl".cast("double") / $"n_docs".cast("double"))
      .withColumn("idf",
        log(lit(1.0) + ($"n_docs".cast("double") - $"df".cast("double") + lit(0.5)) /
          ($"df".cast("double") + lit(0.5))))
      .withColumn("tfn",
        $"tf".cast("double") * lit(2.2) /
          ($"tf".cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) * $"dl".cast("double") / $"avgdl")))
      .withColumn("s_nano", floor($"idf" * $"tfn" * lit(1000000000.0)))
    scored.groupBy($"doc_id")
      .agg(sum($"s_nano").as("score_nano"), count(lit(1)).as("n_terms"))
      .orderBy($"score_nano".desc, $"doc_id").limit(10)
  }

  val q111Sql: String =
    s"""WITH docs AS (SELECT doc_id, $tokensSql AS toks FROM documents),
       | d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM docs),
       | corpus AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
       | tf AS (SELECT doc_id, dl, term, count(*) AS tf
       |        FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
       |        WHERE term IN ('the', 'data', 'model', 'system')
       |        GROUP BY 1, 2, 3),
       | df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
       | scored AS (
       |   SELECT tf.doc_id,
       |     floor(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
       |              / (CAST(df.df AS DOUBLE) + 0.5))
       |       * (CAST(tf.tf AS DOUBLE) * 2.2
       |          / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75
       |             * CAST(tf.dl AS DOUBLE)
       |             / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
       |       * 1000000000.0) AS s_nano
       |   FROM tf JOIN df USING (term) CROSS JOIN corpus)
       |SELECT doc_id, CAST(sum(s_nano) AS BIGINT) AS score_nano,
       |       count(*) AS n_terms
       |FROM scored GROUP BY doc_id
       |ORDER BY score_nano DESC, doc_id LIMIT 10""".stripMargin

  // --------------------------------------------------------------------
  // q113 — conversion funnel (view → click → purchase, strictly ordered
  // timestamps per user): each stage is a keyed min-aggregate joined back
  // to the next stage's events — three shuffles on user_id total,
  // independent of how many stages a funnel has per row. The classic
  // product-analytics operator; at scale each stage join co-partitions on
  // the same user_id key so AQE coalesces them onto one exchange layout.
  // Gap sums stay BIGINT (epoch seconds) — avg derives exactly.
  def q113(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .select($"user_id", $"event_type", $"ts".cast("timestamp").as("ts"))
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val c = ev.filter($"event_type" === "click").join(v, "user_id")
      .filter($"ts" > $"t1")
      .groupBy($"user_id").agg(min($"ts").as("t2"), min($"t1").as("t1k"))
    val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"ts" > $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"), min($"t1k").as("t1p"))
    val stage1 = v.agg(count(lit(1)).as("viewers")).
      crossJoin(c.agg(count(lit(1)).as("clickers")))
      .crossJoin(p.agg(count(lit(1)).as("purchasers"),
        // epoch MICROSECONDS: ts carries sub-second precision, so
        // second-truncated diffs would be engine-dependent; micros are
        // exact BIGINTs in both engines.
        sum(unix_micros($"t3") - unix_micros($"t1p")).as("total_gap_us")))
    stage1.select($"viewers", $"clickers", $"purchasers", $"total_gap_us",
      (floor($"total_gap_us".cast("double") / $"purchasers".cast("double") /
        lit(1000000.0) * lit(1000.0) + lit(0.5)) / lit(1000.0))
        .as("avg_gap_s"))
  }

  val q113Sql: String =
    """WITH ev AS (SELECT user_id, event_type, ts FROM events),
      | v AS (SELECT user_id, min(ts) AS t1 FROM ev
      |       WHERE event_type = 'view' GROUP BY 1),
      | c AS (SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1k
      |       FROM ev e JOIN v ON e.user_id = v.user_id
      |       WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
      | p AS (SELECT e.user_id, min(e.ts) AS t3, min(c.t1k) AS t1p
      |       FROM ev e JOIN c ON e.user_id = c.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
      |SELECT (SELECT count(*) FROM v) AS viewers,
      |       (SELECT count(*) FROM c) AS clickers,
      |       (SELECT count(*) FROM p) AS purchasers,
      |       (SELECT CAST(sum(epoch_us(t3) - epoch_us(t1p)) AS BIGINT) FROM p)
      |         AS total_gap_us,
      |       (SELECT floor(CAST(sum(epoch_us(t3) - epoch_us(t1p)) AS DOUBLE)
      |          / count(*) / 1000000.0 * 1000.0 + 0.5) / 1000.0 FROM p)
      |         AS avg_gap_s""".stripMargin

  // --------------------------------------------------------------------
  // q112 — MapType higher-order functions end-to-end: per-doc word-count
  // maps built with map_from_entries over a SORTED entry array (map
  // entry order = insertion order, so every derived serialization is
  // deterministic), then map_filter / transform_values / map_values /
  // element_at. The map stays inside one row — no shuffle beyond the
  // count agg — which is exactly how feature maps ride through a
  // training pipeline. The oracle computes the same values from the
  // grouped counts directly (maps are Spark-side representation; the
  // semantics are engine-neutral).
  def q112(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cnts = t(s, dir, "documents")
      .select($"doc_id", explode(TextFns.tokens($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
    cnts.groupBy($"doc_id")
      .agg(map_from_entries(array_sort(collect_list(
        struct($"tok".as("k"), $"c".as("v"))))).as("wc"))
      .select(
        $"doc_id",
        array_join(transform(map_entries(map_filter($"wc", (_, v) => v >= 2)),
          e => concat(e.getField("key"), lit(":"), e.getField("value"))), " ")
          .as("rep_toks"),
        size(map_filter($"wc", (_, v) => v >= 2)).cast("long").as("n_rep"),
        aggregate(map_values(transform_values($"wc", (_, v) => v * v)),
          lit(0L), (acc, x) => acc + x).as("sq_sum"),
        coalesce(element_at($"wc", "the"), lit(0L)).as("the_cnt"),
        size($"wc").cast("long").as("n_distinct"))
      .orderBy($"doc_id")
  }

  val q112Sql: String =
    s"""WITH cn AS (
       |  SELECT doc_id, tok, count(*) AS c
       |  FROM (SELECT doc_id, unnest($tokensSql) AS tok FROM documents)
       |  GROUP BY 1, 2)
       |SELECT doc_id,
       | coalesce(array_to_string(list_transform(
       |     list_sort(list({'k': tok, 'v': c}) FILTER (c >= 2)),
       |     r -> r.k || ':' || r.v), ' '), '') AS rep_toks,
       | CAST(count(*) FILTER (c >= 2) AS BIGINT) AS n_rep,
       | CAST(sum(c * c) AS BIGINT) AS sq_sum,
       | CAST(coalesce(max(CASE WHEN tok = 'the' THEN c END), 0) AS BIGINT)
       |   AS the_cnt,
       | count(*) AS n_distinct
       |FROM cn GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q114 — Delta-style MERGE (CDC apply) via ext.MergeInto: a
  // deterministic change batch (deletes for keys ≡0 mod 10, updates for
  // ≡3, inserts of brand-new keys for ≡7) applied to the orders snapshot
  // in ONE full-outer join, then fingerprinted per status. Generalizes
  // the reference's in-place UPDATE sink (SURVEY §2.1 K5) to the
  // insert/update/delete triple every lakehouse table maintenance job
  // needs. Money stays integer cents under the aggregate.
  def q114(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val del = base.filter($"o_orderkey" % 10 === 0)
      .select($"o_orderkey", lit("D").as("op"),
        lit(null).cast("string").as("o_orderstatus"),
        lit(null).cast("double").as("o_totalprice"))
    val upd = base.filter($"o_orderkey" % 10 === 3)
      .select($"o_orderkey", lit("U").as("op"), lit("U").as("o_orderstatus"),
        ($"o_totalprice" + lit(100.0)).as("o_totalprice"))
    val ins = base.filter($"o_orderkey" % 10 === 7)
      .select(($"o_orderkey" + lit(1000000L)).as("o_orderkey"),
        lit("I").as("op"), lit("N").as("o_orderstatus"), $"o_totalprice")
    val merged = graft.ext.MergeInto(base, del.unionByName(upd).unionByName(ins),
      key = "o_orderkey")
    merged.groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(floor($"o_totalprice" * lit(100.0))).as("cents"))
      .orderBy($"o_orderstatus")
  }

  val q114Sql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      | ch AS (
      |  SELECT o_orderkey, 'D' AS op, CAST(NULL AS VARCHAR) AS st,
      |         CAST(NULL AS DOUBLE) AS tp
      |  FROM base WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 'U', 'U', o_totalprice + 100.0
      |  FROM base WHERE o_orderkey % 10 = 3
      |  UNION ALL
      |  SELECT o_orderkey + 1000000, 'I', 'N', o_totalprice
      |  FROM base WHERE o_orderkey % 10 = 7),
      | merged AS (
      |  SELECT CASE WHEN c.op IS NOT NULL THEN c.st
      |              ELSE b.o_orderstatus END AS o_orderstatus,
      |         CASE WHEN c.op IS NOT NULL THEN c.tp
      |              ELSE b.o_totalprice END AS tp
      |  FROM base b FULL OUTER JOIN ch c ON b.o_orderkey = c.o_orderkey
      |  WHERE coalesce(c.op, '') <> 'D')
      |SELECT o_orderstatus, count(*) AS n,
      |       CAST(sum(CAST(floor(tp * 100.0) AS BIGINT)) AS BIGINT) AS cents
      |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------
  // q115 — behavior-sequence pattern mining (MATCH_RECOGNIZE emulation):
  // each user's event stream collapses to an ordered initial-letter
  // string (deterministic: sorted by ts then event_id inside the
  // aggregate — Spark array_sort over structs ≡ SQL ORDER BY inside
  // string_agg), then regex does the sequence matching: funnel
  // containment v.*c.*p and non-overlapping adjacent 'vc' count. The
  // per-user string is bounded by that user's event count, so this
  // scales as one shuffle + scan regardless of corpus size.
  def q115(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"user_id", $"ts".cast("timestamp").as("ts"), $"event_id",
        substring($"event_type", 1, 1).as("i"))
      .groupBy($"user_id")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct($"ts", $"event_id", $"i"))),
        x => x.getField("i"))).as("journey"))
      .select($"user_id", length($"journey").cast("long").as("n_events"),
        $"journey".rlike("v.*c.*p").as("has_funnel"),
        size(regexp_extract_all($"journey", lit("vc"), lit(0))).cast("long")
          .as("n_vc"))
      .orderBy($"user_id")
  }

  val q115Sql: String =
    """WITH j AS (
      |  SELECT user_id,
      |         string_agg(substring(event_type, 1, 1), ''
      |           ORDER BY ts, event_id) AS journey
      |  FROM events GROUP BY 1)
      |SELECT user_id, CAST(length(journey) AS BIGINT) AS n_events,
      |       regexp_matches(journey, 'v.*c.*p') AS has_funnel,
      |       CAST(len(regexp_extract_all(journey, 'vc')) AS BIGINT) AS n_vc
      |FROM j ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------------
  // q116 — gap filling with IGNORE NULLS window functions: sensor-style
  // forward fill (last known value carries over nulls) plus the previous
  // distinct known reading. A deterministic total order (ts, event_id)
  // inside each user partition makes the fill reproducible; the window
  // is keyed, so no partition ever concentrates the stream. This is the
  // canonical telemetry-repair pass before feature extraction.
  def q116(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(s, dir, "events")
      .select($"user_id", $"ts".cast("timestamp").as("ts"), $"event_id",
        when($"event_id" % 7 === 0, lit(null).cast("double"))
          .otherwise($"value").as("v"))
      .select($"user_id", $"event_id", $"v",
        last($"v", ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("ffill"),
        lag($"v", 1, null, ignoreNulls = true).over(w).as("prev_known"))
      .orderBy($"event_id")
  }

  val q116Sql: String =
    """WITH e AS (SELECT user_id, ts, event_id,
      |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      |  FROM events)
      |SELECT user_id, event_id, v,
      |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
      |  lag(v IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS prev_known
      |FROM e ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------------
  // q117 — mergeable HLL sketches (Apache DataSketches via
  // hll_sketch_agg / hll_union_agg / hll_sketch_estimate): per-day
  // sketches union across days WITHOUT touching raw keys again — the
  // incremental distinct-count cube that replaces COUNT(DISTINCT) over
  // history at 100 TB (q110's bitmaps are the exact variant; sketches
  // are the fixed-size one). Estimates are engine-specific, so the
  // CHECKED output is the exact count plus a boolean asserting the
  // sketch landed within its published error envelope (±3σ ≈ 2.5% at
  // lgK=12) — deterministic for a given input set because HLL state is
  // order-invariant.
  def q117(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events").createOrReplaceTempView("ev_q117")
    s.sql(
      """WITH daily AS (
        |  SELECT event_type, to_date(CAST(ts AS TIMESTAMP)) AS day,
        |         hll_sketch_agg(user_id, 12) AS sk,
        |         count(DISTINCT user_id) AS day_exact
        |  FROM ev_q117 GROUP BY 1, 2),
        | merged AS (
        |  SELECT event_type,
        |         hll_sketch_estimate(hll_union_agg(sk)) AS est,
        |         count(*) AS n_days
        |  FROM daily GROUP BY 1),
        | exact AS (
        |  SELECT event_type, count(DISTINCT user_id) AS exact_users
        |  FROM ev_q117 GROUP BY 1)
        |SELECT e.event_type, e.exact_users, m.n_days,
        |       abs(m.est - CAST(e.exact_users AS DOUBLE))
        |         <= 0.025 * CAST(e.exact_users AS DOUBLE) + 1.0 AS within_bound
        |FROM exact e JOIN merged m ON e.event_type = m.event_type
        |ORDER BY e.event_type""".stripMargin)
  }

  val q117Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users,
      |       count(DISTINCT CAST(ts AS DATE)) AS n_days,
      |       TRUE AS within_bound
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q106_lateral_topk" -> (q106 _),
    "q107_array_ops" -> (q107 _),
    "q108_corr_regression" -> (q108 _),
    "q109_try_arith" -> (q109 _),
    "q110_bitmap_distinct" -> (q110 _),
    "q111_bm25" -> (q111 _),
    "q112_map_hof" -> (q112 _),
    "q113_funnel" -> (q113 _),
    "q114_merge_cdc" -> (q114 _),
    "q115_behavior_pattern" -> (q115 _),
    "q116_gap_fill" -> (q116 _),
    "q117_hll_sketch" -> (q117 _))

  val oracles: Map[String, String] = Map(
    "q106_lateral_topk" -> q106Sql,
    "q107_array_ops" -> q107Sql,
    "q108_corr_regression" -> q108Sql,
    "q109_try_arith" -> q109Sql,
    "q110_bitmap_distinct" -> q110Sql,
    "q111_bm25" -> q111Sql,
    "q112_map_hof" -> q112Sql,
    "q113_funnel" -> q113Sql,
    "q114_merge_cdc" -> q114Sql,
    "q115_behavior_pattern" -> q115Sql,
    "q116_gap_fill" -> q116Sql,
    "q117_hll_sketch" -> q117Sql)
}
