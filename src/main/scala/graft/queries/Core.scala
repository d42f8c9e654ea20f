package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** Core relational query catalog over the driver's synthetic TPC-H-ish
  * tables. Each query re-expresses one or more operators from the
  * reference's inventory (SURVEY.md §2) Spark-first, and carries an ANSI
  * SQL oracle the driver replays in DuckDB.
  *
  * Scale notes (100 TB target) are attached per query; the common rules:
  * filters/projections sit directly on the parquet scan (pushdown +
  * pruning), aggregates are partial+final hash aggs, small dimensions are
  * broadcast, and final `orderBy` only runs on already-aggregated
  * (small) results — never on raw fact rows except where the query's
  * contract IS a per-row transform, in which case output order comes from
  * a key sort that AQE handles with range partitioning.
  */
object Core {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------------
  // q01 — pricing summary: grouped multi-aggregate with upstream filter.
  // Reference ops: A1 count, A3/A5 avg, A4/A6 sum, F2 global filter,
  // T6 ordered groups, C6 rounding (compute_daily_metrics.py:45–94).
  // Scale: one shuffle (partial+final hash agg); filter pushed to scan.
  def q01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_quantity" > 2)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).as("n_items"),
        sum($"l_quantity").as("sum_qty"),
        round(avg($"l_quantity"), 2).as("avg_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_price"),
        round(avg($"l_discount"), 4).as("avg_disc")
      )
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n_items,
      | sum(l_quantity) AS sum_qty, round(avg(l_quantity), 2) AS avg_qty,
      | round(sum(l_extendedprice), 2) AS sum_price,
      | round(avg(l_discount), 4) AS avg_disc
      |FROM lineitem WHERE l_quantity > 2
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --------------------------------------------------------------------
  // q02 — filter + rename-projection (P1/P2 Polish→English rename,
  // F3/F9 date-range filter; data_load_sqlite.py:146–187, app.js:151–153).
  // Scale: predicate + column pruning reach the parquet scan; the final
  // key sort is the only exchange.
  def q02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter(
        $"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
          $"l_shipdate" < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          $"l_discount" > 0.05
      )
      .select(
        $"l_orderkey".as("order_id"),
        $"l_linenumber".as("line_no"),
        $"l_quantity".as("qty"),
        to_date($"l_shipdate").as("ship_day")
      )
      .orderBy($"order_id", $"line_no")
  }

  val q02Sql: String =
    """SELECT l_orderkey AS order_id, l_linenumber AS line_no,
      | l_quantity AS qty, CAST(l_shipdate AS DATE) AS ship_day
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_discount > 0.05
      |ORDER BY order_id, line_no""".stripMargin

  // --------------------------------------------------------------------
  // q03 — broadcast left equi-join + grouped agg (J1/J2 station-coords
  // enrichment joins, data_load_sqlite.py:138–139). customer is the
  // bounded dimension => explicit broadcast() so 100 TB of orders never
  // shuffles for the join.
  def q03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .groupBy(coalesce($"c_mktsegment", lit("UNKNOWN")).as("segment"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("revenue")
      )
      .orderBy($"segment")
  }

  val q03Sql: String =
    """SELECT coalesce(c_mktsegment, 'UNKNOWN') AS segment,
      | count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY segment""".stripMargin

  // --------------------------------------------------------------------
  // q04 — full-outer join of two keyed aggregates + coalesce + top-5
  // with deterministic tie-break: the busiest-stations shape (J3/U1/C5/
  // T1, compute_daily_metrics.py:112–143). The reference emulates
  // full-outer with UNION + 2 left joins (SQLite limitation); Catalyst
  // gives us the native operator. Scale: both sides are post-aggregate
  // (bounded by |stations|), so the join is broadcast-able; top-5 is
  // TakeOrderedAndProject (no global sort of facts).
  def q04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val dep = ev.filter($"event_type" === "click")
      .groupBy($"user_id").agg(count(lit(1)).as("departures"))
    val arr = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(count(lit(1)).as("arrivals"))
    dep.join(arr, Seq("user_id"), "full_outer")
      .select(
        $"user_id",
        coalesce($"departures", lit(0L)).as("departures"),
        coalesce($"arrivals", lit(0L)).as("arrivals")
      )
      .withColumn("total", $"departures" + $"arrivals")
      .orderBy($"total".desc, $"user_id".asc)
      .limit(5)
  }

  val q04Sql: String =
    """SELECT user_id, coalesce(departures, 0) AS departures,
      | coalesce(arrivals, 0) AS arrivals,
      | coalesce(departures, 0) + coalesce(arrivals, 0) AS total
      |FROM (SELECT user_id, count(*) AS departures FROM events
      |      WHERE event_type = 'click' GROUP BY user_id) d
      |FULL OUTER JOIN (SELECT user_id, count(*) AS arrivals FROM events
      |      WHERE event_type = 'purchase' GROUP BY user_id) a
      |USING (user_id)
      |ORDER BY total DESC, user_id ASC LIMIT 5""".stripMargin

  // --------------------------------------------------------------------
  // q05 — left-anti join: the idempotent-append dedup core (K2,
  // data_load_sqlite.py:218–235 INSERT OR IGNORE => anti-join in Spark).
  // Scale: anti-join shuffles on the key; with a date-partitioned store
  // the probe side prunes to overlapping partitions.
  def q05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter($"o_totalprice" > 350000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val q05Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_totalprice > 350000 AND o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------------
  // q06 — UNION DISTINCT of key sets (U1, compute_daily_metrics.py:127–131).
  def q06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer").select($"c_nationkey".as("nationkey"))
    val sup = t(s, dir, "supplier").select($"s_nationkey".as("nationkey"))
    c.union(sup).distinct().orderBy($"nationkey")
  }

  val q06Sql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION
      |SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  // --------------------------------------------------------------------
  // q07 — hourly histogram (A2/C3, compute_daily_metrics.py:56–63).
  // Sparse: only hours with events appear, exactly like the reference.
  def q07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(hour($"ts").as("hour"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"hour")
  }

  val q07Sql: String =
    """SELECT CAST(hour(ts) AS INTEGER) AS hour, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY hour""".stripMargin

  // --------------------------------------------------------------------
  // q08 — one-pass conditional aggregates (A1/A7/A8 + F5/F6 predicates,
  // compute_daily_metrics.py:97–109): the reference runs 11 separate
  // scans; here every metric is a single pass (the headline algorithmic
  // win called out in SURVEY.md §3.2).
  def q08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .filter($"value" > 2)
      .agg(
        count(lit(1)).as("total_events"),
        count(when($"event_type" === "error", 1)).as("errors"),
        count(when($"event_type" === "signup", 1)).as("signups"),
        count(when($"value" > 100, 1)).as("high_value"),
        round(avg($"value"), 2).as("avg_value"),
        round(sum($"value"), 2).as("total_value")
      )
  }

  val q08Sql: String =
    """SELECT count(*) AS total_events,
      | count(CASE WHEN event_type = 'error' THEN 1 END) AS errors,
      | count(CASE WHEN event_type = 'signup' THEN 1 END) AS signups,
      | count(CASE WHEN value > 100 THEN 1 END) AS high_value,
      | round(avg(value), 2) AS avg_value,
      | round(sum(value), 2) AS total_value
      |FROM events WHERE value > 2""".stripMargin

  // --------------------------------------------------------------------
  // q09 — distinct active days in a year (A12/C2/C4,
  // compute_daily_metrics.py:197–202).
  def q09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .filter(year($"ts") === 2024)
      .select(to_date($"ts").as("day"))
      .distinct()
      .orderBy($"day")
  }

  val q09Sql: String =
    """SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
      |WHERE year(ts) = 2024 ORDER BY day""".stripMargin

  // --------------------------------------------------------------------
  // q10 — latest day (A13, compute_daily_metrics.py:300–305): expressed
  // as max() so it's a partial-agg, not the reference's ORDER BY+LIMIT 1
  // full sort.
  def q10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events").agg(max(to_date($"ts")).as("latest_day"))
  }

  val q10Sql: String =
    "SELECT max(CAST(ts AS DATE)) AS latest_day FROM events"

  // --------------------------------------------------------------------
  // q11 — route counts + deterministic top-5 (A11/T2,
  // compute_daily_metrics.py:158–168): two-column group, order by count
  // desc then keys asc.
  def q11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"o_orderpriority".asc, $"o_orderstatus".asc)
      .limit(5)
  }

  val q11Sql: String =
    """SELECT o_orderpriority, o_orderstatus, count(*) AS n
      |FROM orders GROUP BY 1, 2
      |ORDER BY n DESC, o_orderpriority ASC, o_orderstatus ASC
      |LIMIT 5""".stripMargin

  // --------------------------------------------------------------------
  // q12 — date-range re-aggregation (A14–A17/T3/F9, web/js/app.js:141–194):
  // the browser's "aggregate per-day metrics over a range" surface,
  // server-side: daily rollup then range rollup, two shuffles total.
  def q12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = t(s, dir, "events")
      .filter(to_date($"ts").between(lit("2024-01-01"), lit("2024-01-31")))
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"))
    daily
      .groupBy($"event_type")
      .agg(
        round(avg($"n"), 2).as("avg_daily"),
        sum($"n").as("total"),
        count(lit(1)).as("days_active")
      )
      .orderBy($"event_type")
  }

  val q12Sql: String =
    """SELECT event_type, round(avg(n), 2) AS avg_daily,
      | CAST(sum(n) AS BIGINT) AS total, count(*) AS days_active
      |FROM (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
      |      FROM events
      |      WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-31'
      |      GROUP BY 1, 2) d
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------
  // q13 — string cleanup + null-safe '#' filter (P3/C8/C9/F1,
  // data_load_sqlite.py:125–135): NBSP strip, rtrim, 'nan'→NULL sentinel,
  // keep rows whose source does NOT start with '#' (nulls kept, matching
  // pandas startswith(na=False)).
  def q13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cleaned = t(s, dir, "documents")
      .withColumn("clean_len",
        length(rtrim(regexp_replace($"text", "\u00a0", " "))))
      .withColumn("source_clean",
        when($"source" === "nan", lit(null)).otherwise($"source"))
      .filter(!coalesce($"source_clean".startsWith("#"), lit(false)))
    cleaned.select($"doc_id", $"clean_len", $"source_clean").orderBy($"doc_id")
  }

  val q13Sql: String =
    """SELECT doc_id,
      | CAST(length(rtrim(replace(text, chr(160), ' '))) AS INTEGER) AS clean_len,
      | nullif(source, 'nan') AS source_clean
      |FROM documents
      |WHERE NOT coalesce(starts_with(nullif(source, 'nan'), '#'), false)
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q14 — JSON field navigation + coerce-to-null cast (C16/P4,
  // bike_status_changes.py:41–46; data_load_sqlite.py:162–177).
  // (Measured alternative: from_json with an explicit schema is NOT
  // faster here — these props are single-field objects, so per-row parse
  // setup dominates either way.)
  def q14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select(
        $"event_id",
        get_json_object($"props", "$.k").cast("int").as("k_val")
      )
      .filter($"k_val".isNotNull && $"k_val" % 7 === 0)
      .orderBy($"event_id")
  }

  val q14Sql: String =
    """SELECT event_id,
      | TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
      |FROM events
      |WHERE TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
      |  AND TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) % 7 = 0
      |ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------------
  // q15 — haversine distance (C1, data_load_sqlite.py:100–111): the
  // reference's one custom scalar, as a pure codegen'd column expression
  // (no UDF — stays inside whole-stage codegen at 100 TB). Coordinates
  // are synthesized deterministically from keys.
  def q15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem").filter($"l_linenumber" === 1)
    val lat1 = ($"l_partkey" % 90).cast("double")
    val lon1 = ($"l_suppkey" % 180).cast("double")
    val lat2 = ($"l_orderkey" % 90).cast("double")
    val lon2 = (($"l_orderkey" + $"l_partkey") % 180).cast("double")
    li.select(
        $"l_orderkey",
        round(Geo.haversineKm(lat1, lon1, lat2, lon2), 3).as("dist_km")
      )
      .orderBy($"l_orderkey")
  }

  val q15Sql: String =
    """SELECT l_orderkey,
      | round(2 * 6371.0088 * asin(sqrt(
      |   pow(sin((radians(CAST(l_orderkey % 90 AS DOUBLE)) - radians(CAST(l_partkey % 90 AS DOUBLE))) / 2), 2)
      |   + cos(radians(CAST(l_partkey % 90 AS DOUBLE))) * cos(radians(CAST(l_orderkey % 90 AS DOUBLE)))
      |     * pow(sin((radians(CAST((l_orderkey + l_partkey) % 180 AS DOUBLE)) - radians(CAST(l_suppkey % 180 AS DOUBLE))) / 2), 2)
      | )), 3) AS dist_km
      |FROM lineitem WHERE l_linenumber = 1
      |ORDER BY l_orderkey""".stripMargin

  // --------------------------------------------------------------------
  // q16 — keyed change detection (J4/ST2 batch analog,
  // bike_status_changes.py:106–157): per-key previous-state compare via
  // lag window; emits a row where state changed — the snapshot-diff
  // semantic in one declarative pass. Scale: one shuffle on the key
  // (window partitionBy), no driver state.
  def q16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    t(s, dir, "events")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull && $"prev_type" =!= $"event_type")
      .select($"user_id", $"event_id", $"prev_type",
        $"event_type".as("curr_type"))
      .orderBy($"user_id", $"event_id")
  }

  val q16Sql: String =
    """SELECT user_id, event_id, prev_type, event_type AS curr_type
      |FROM (SELECT user_id, event_id, event_type,
      |        lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
      |          AS prev_type
      |      FROM events) x
      |WHERE prev_type IS NOT NULL AND prev_type <> event_type
      |ORDER BY user_id, event_id""".stripMargin

  // --------------------------------------------------------------------
  // q17 — idempotent-append delta (K2, data_load_sqlite.py:218–235):
  // which incoming rows survive the INSERT-OR-IGNORE dedup against the
  // existing table. Library form: graft.store.IdempotentAppend.
  def q17(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val existing = ev.filter($"event_id" % 10 =!= 0)
    val incoming = ev.filter($"event_id" < 500)
    graft.store.IdempotentAppend
      .newRows(incoming, existing, Seq("event_id"))
      .select($"event_id", $"event_type")
      .orderBy($"event_id")
  }

  val q17Sql: String =
    """SELECT event_id, event_type FROM events
      |WHERE event_id < 500
      |  AND NOT EXISTS (SELECT 1 FROM events e2
      |                  WHERE e2.event_id % 10 <> 0
      |                    AND e2.event_id = events.event_id)
      |ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------------
  // q18b/q30 — the REAL library snapshot-diff operator (J4/ST2,
  // graft.status.SnapshotDiff) on synthetic "snapshots" derived from the
  // events table: full-outer keyed diff emitting departed/arrived events
  // with null-safe station compare. Scale: one shuffle on bike_id.
  def q30(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    def snap(m: Int) = ev.filter($"event_id" % 3 === m)
      .groupBy($"user_id")
      .agg(
        (count(lit(1)) % 5).cast("string").as("station_id"),
        max($"event_type").as("station_name"),
        bround(min($"value"), 2).as("lat"),
        bround(max($"value"), 2).as("lon")
      )
      .select(
        $"user_id".cast("string").as("bike_id"),
        $"station_name", $"station_id", $"lat", $"lon",
        lit(null).cast("string").as("bike_type"),
        lit(null).cast("double").as("battery")
      )
    graft.status.SnapshotDiff
      .events(snap(0), snap(1), "2024-02-01T00:00:00+01:00")
      .orderBy($"bike_id", $"event_type", $"station_id")
  }

  val q30Sql: String =
    """WITH p AS (
      |  SELECT CAST(user_id AS VARCHAR) AS bike_id,
      |         max(event_type) AS station_name,
      |         CAST(count(*) % 5 AS VARCHAR) AS station_id,
      |         round(min(value), 2) AS lat, round(max(value), 2) AS lon
      |  FROM events WHERE event_id % 3 = 0 GROUP BY user_id),
      | c AS (
      |  SELECT CAST(user_id AS VARCHAR) AS bike_id,
      |         max(event_type) AS station_name,
      |         CAST(count(*) % 5 AS VARCHAR) AS station_id,
      |         round(min(value), 2) AS lat, round(max(value), 2) AS lon
      |  FROM events WHERE event_id % 3 = 1 GROUP BY user_id)
      |SELECT '2024-02-01T00:00:00+01:00' AS timestamp, p.bike_id,
      |       'departed' AS event_type, p.station_name, p.station_id,
      |       p.lat, p.lon, CAST(NULL AS VARCHAR) AS bike_type,
      |       CAST(NULL AS DOUBLE) AS battery
      |FROM p LEFT JOIN c ON p.bike_id = c.bike_id
      |WHERE c.bike_id IS NULL OR p.station_id IS DISTINCT FROM c.station_id
      |UNION ALL
      |SELECT '2024-02-01T00:00:00+01:00', c.bike_id, 'arrived',
      |       c.station_name, c.station_id, c.lat, c.lon,
      |       CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE)
      |FROM c LEFT JOIN p ON p.bike_id = c.bike_id
      |WHERE p.bike_id IS NULL OR p.station_id IS DISTINCT FROM c.station_id
      |ORDER BY bike_id, event_type, station_id""".stripMargin

  // --------------------------------------------------------------------
  // q33 — the flagship metrics operator (graft.metrics.DailyMetrics
  // .allDays: F2 global filter + A1–A11 + J3 + T1/T2 in ONE job) run on a
  // rides-shaped projection of the events table and hash-checked against
  // DuckDB. Integer metrics only, so the comparison is exact (the
  // rounding-sensitive columns are covered by the ScalaTest goldens).
  def q33(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.metrics.DailyMetrics.allDays(ridesFromEvents(s, dir))
      .select($"date", $"total_rides", $"total_duration_min",
        $"round_trips", $"left_outside_station")
      .orderBy($"date")
  }

  val q33Sql: String =
    """WITH r AS (
      |  SELECT ts AS start_time, CAST(floor(value) AS INT) AS duration,
      |         event_type AS start_station,
      |         CASE WHEN value > 66 THEN reverse(event_type)
      |              WHEN value > 50 THEN event_type
      |              ELSE 'Poza stacją' END AS end_station
      |  FROM events),
      | b AS (SELECT * FROM r WHERE duration > 2 AND start_time IS NOT NULL)
      |SELECT strftime(CAST(start_time AS DATE), '%Y-%m-%d') AS date,
      |       count(*) AS total_rides,
      |       CAST(coalesce(sum(duration), 0) AS BIGINT) AS total_duration_min,
      |       count(CASE WHEN start_station IS NOT NULL
      |                   AND end_station IS NOT NULL
      |                   AND start_station = end_station THEN 1 END)
      |         AS round_trips,
      |       count(CASE WHEN end_station = 'Poza stacją' THEN 1 END)
      |         AS left_outside_station
      |FROM b GROUP BY 1 ORDER BY date""".stripMargin

  /** The rides-shaped projection of the events table shared by q33/q34. */
  private def ridesFromEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events").select(
      $"ts".as("start_time"),
      floor($"value").cast("int").as("duration"),
      ($"value" / 10).as("distance"),
      $"event_type".as("start_station"),
      when($"value" > 66, reverse($"event_type"))        // moved: a→b route
        .when($"value" > 50, $"event_type")              // round trip
        .otherwise(lit("Poza stacją"))                   // left outside
        .as("end_station")
    )
  }

  /** Shared oracle CTEs matching [[ridesFromEvents]] + the F2 filter. */
  private val ridesFromEventsSql: String =
    """r AS (
      |  SELECT ts AS start_time, CAST(floor(value) AS INT) AS duration,
      |         event_type AS start_station,
      |         CASE WHEN value > 66 THEN reverse(event_type)
      |              WHEN value > 50 THEN event_type
      |              ELSE 'Poza stacją' END AS end_station
      |  FROM events),
      | b AS (SELECT * FROM r WHERE duration > 2 AND start_time IS NOT NULL)""".stripMargin

  // --------------------------------------------------------------------
  // q34 — the range re-aggregation surface (A15/T3, web/js/app.js:165–181)
  // with the REAL library operators end-to-end: DailyMetrics.allDays
  // builds per-day top-5 busiest-station lists, RangeMetrics
  // .busiestStations explodes + re-ranks them over a date range —
  // including the deliberately lossy aggregate-of-pre-truncated-top-5
  // semantics the reference's browser implements.
  def q34(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = graft.metrics.DailyMetrics.allDays(ridesFromEvents(s, dir))
    graft.metrics.RangeMetrics
      .busiestStations(daily, "2024-01-05", "2024-01-20")
      .select($"station",
        $"arrivals".cast("long").as("arrivals"),
        $"departures".cast("long").as("departures"),
        $"total".cast("long").as("total"))
  }

  val q34Sql: String =
    s"""WITH $ridesFromEventsSql,
       | dep AS (SELECT CAST(start_time AS DATE) AS day,
       |                start_station AS station, count(*) AS departures
       |         FROM b WHERE start_station IS NOT NULL
       |           AND start_station <> 'Poza stacją' GROUP BY 1, 2),
       | arr AS (SELECT CAST(start_time AS DATE) AS day,
       |                end_station AS station, count(*) AS arrivals
       |         FROM b WHERE end_station IS NOT NULL
       |           AND end_station <> 'Poza stacją' GROUP BY 1, 2),
       | j AS (SELECT coalesce(dep.day, arr.day) AS day,
       |              coalesce(dep.station, arr.station) AS station,
       |              coalesce(arrivals, 0) AS arrivals,
       |              coalesce(departures, 0) AS departures
       |       FROM dep FULL OUTER JOIN arr
       |         ON dep.day = arr.day AND dep.station = arr.station),
       | t AS (SELECT *, arrivals + departures AS total,
       |              row_number() OVER (PARTITION BY day
       |                ORDER BY arrivals + departures DESC, station ASC) AS rk
       |       FROM j),
       | top5 AS (SELECT * FROM t WHERE rk <= 5
       |          AND day BETWEEN DATE '2024-01-05' AND DATE '2024-01-20')
       |SELECT station, CAST(sum(arrivals) AS BIGINT) AS arrivals,
       |       CAST(sum(departures) AS BIGINT) AS departures,
       |       CAST(sum(total) AS BIGINT) AS total
       |FROM top5 GROUP BY station
       |ORDER BY total DESC, station ASC LIMIT 5""".stripMargin

  // --------------------------------------------------------------------
  // q35 — range histogram mean (A14/C15, web/js/app.js:155–163) with the
  // real operators: per-day sparse hour map from DailyMetrics.allDays,
  // averaged over the range by RangeMetrics.histogramAvg — absent hours
  // count 0, Math.round (HALF_UP via floor(x+0.5)) like the browser.
  def q35(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = graft.metrics.DailyMetrics.allDays(ridesFromEvents(s, dir))
    graft.metrics.RangeMetrics.histogramAvg(daily, "2024-01-05", "2024-01-20")
  }

  val q35Sql: String =
    s"""WITH $ridesFromEventsSql,
       | hr AS (SELECT CAST(start_time AS DATE) AS day,
       |               CAST(hour(start_time) AS INTEGER) AS hour,
       |               count(*) AS n
       |        FROM b GROUP BY 1, 2),
       | days AS (SELECT DISTINCT day FROM hr
       |          WHERE day BETWEEN DATE '2024-01-05' AND DATE '2024-01-20'),
       | grid AS (SELECT d.day, h.hour
       |          FROM days d CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS hour) h),
       | filled AS (SELECT g.day, g.hour, coalesce(hr.n, 0) AS n
       |            FROM grid g LEFT JOIN hr ON hr.day = g.day AND hr.hour = g.hour)
       |SELECT hour,
       |       CAST(floor(CAST(sum(n) AS DOUBLE) / (SELECT count(*) FROM days) + 0.5)
       |            AS BIGINT) AS avg_rentals
       |FROM filled GROUP BY hour ORDER BY hour""".stripMargin

  // --------------------------------------------------------------------
  // q36 — event-time tumbling-window aggregation (ST-extension surface,
  // graft.streaming.EventWindows) in batch mode, oracle-checked: 6-hour
  // windows align identically on epoch-midnight in Spark's window() and
  // DuckDB's time_bucket. Scale: one shuffle on (window, station);
  // streaming mode bounds state by the watermark.
  def q36(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = t(s, dir, "events").select(
      $"ts".as("event_ts"),
      $"event_type".as("station_name"),
      when($"value" > 50, lit("arrived")).otherwise(lit("departed"))
        .as("event_type")
    )
    graft.streaming.EventWindows
      .stationTraffic(events, "6 hours", "10 minutes")
      .orderBy($"window_start", $"station_name")
  }

  val q36Sql: String =
    """SELECT time_bucket(INTERVAL 6 HOURS, ts) AS window_start,
      |       time_bucket(INTERVAL 6 HOURS, ts) + INTERVAL 6 HOURS AS window_end,
      |       event_type AS station_name,
      |       count(CASE WHEN value > 50 THEN 1 END) AS arrivals,
      |       count(CASE WHEN value <= 50 THEN 1 END) AS departures
      |FROM events
      |GROUP BY 1, 2, 3
      |ORDER BY window_start, station_name""".stripMargin

  // --------------------------------------------------------------------
  // q37 — range top-routes re-rank (A16/T3, web/js/app.js:183–194):
  // completes the RangeMetrics trio under the oracle. Per-day top-5
  // route lists from allDays, summed per "start → end" key, re-ranked.
  def q37(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = graft.metrics.DailyMetrics.allDays(ridesFromEvents(s, dir))
    graft.metrics.RangeMetrics
      .topRoutes(daily, "2024-01-05", "2024-01-20")
      .select($"route", $"rides".cast("long").as("rides"))
  }

  val q37Sql: String =
    s"""WITH $ridesFromEventsSql,
       | rc AS (SELECT CAST(start_time AS DATE) AS day,
       |               start_station, end_station, count(*) AS rides
       |        FROM b
       |        WHERE start_station IS NOT NULL AND end_station IS NOT NULL
       |          AND start_station <> end_station
       |          AND start_station <> 'Poza stacją'
       |          AND end_station <> 'Poza stacją'
       |        GROUP BY 1, 2, 3),
       | t AS (SELECT *, row_number() OVER (PARTITION BY day
       |         ORDER BY rides DESC, start_station ASC, end_station ASC) AS rk
       |       FROM rc),
       | top5 AS (SELECT * FROM t WHERE rk <= 5
       |          AND day BETWEEN DATE '2024-01-05' AND DATE '2024-01-20')
       |SELECT start_station || ' → ' || end_station AS route,
       |       CAST(sum(rides) AS BIGINT) AS rides
       |FROM top5 GROUP BY 1
       |ORDER BY rides DESC, route ASC LIMIT 5""".stripMargin

  // --------------------------------------------------------------------
  // q118 — the distance-backfill chain (F8/J5/K5, reference:
  // src/backfill_distance.py:45–84) under the oracle: a rides-shaped
  // frame with deterministic coordinates and deliberately-NULL distances
  // goes through the REAL operators — Backfill.candidates (the dry-run
  // predicate) and Backfill.apply (the coalesce rewrite). The reference
  // UPDATEs row-by-row in Python; here it's one codegen'd pass and the
  // candidate flag is a broadcast-able left join of the dry-run output.
  def q118(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rides = t(s, dir, "events").select(
      $"event_id".as("uid"),
      when($"event_id" % 5 === 0, lit(null))
        .otherwise($"value" / 10).cast("double").as("distance"),
      when($"event_id" % 7 === 0, lit(null))
        .otherwise(($"user_id" % 90).cast("double")).as("lat_start"),
      ($"user_id" % 180).cast("double").as("lon_start"),
      ($"event_id" % 90).cast("double").as("lat_end"),
      (($"event_id" + $"user_id") % 180).cast("double").as("lon_end"))
    val cand = graft.store.Backfill.candidates(rides)
      .select($"uid", lit(true).as("was_candidate"))
    // haversine mode: the geodesic default (Vincenty) is a data-dependent
    // iteration DuckDB can't express; the chain under test is identical.
    graft.store.Backfill(rides, useGeodesic = false)
      .join(cand, Seq("uid"), "left")
      .select($"uid", $"distance".as("distance_km"),
        coalesce($"was_candidate", lit(false)).as("was_candidate"))
      .orderBy($"uid")
  }

  val q118Sql: String =
    """WITH r AS (
      |  SELECT event_id AS uid,
      |         CASE WHEN event_id % 5 = 0 THEN NULL ELSE value / 10 END AS distance,
      |         CASE WHEN event_id % 7 = 0 THEN NULL
      |              ELSE CAST(user_id % 90 AS DOUBLE) END AS lat_start,
      |         CAST(user_id % 180 AS DOUBLE) AS lon_start,
      |         CAST(event_id % 90 AS DOUBLE) AS lat_end,
      |         CAST((event_id + user_id) % 180 AS DOUBLE) AS lon_end
      |  FROM events)
      |SELECT uid,
      |       coalesce(distance, round(2 * 6371.0088 * asin(sqrt(
      |         pow(sin((radians(lat_end) - radians(lat_start)) / 2), 2)
      |         + cos(radians(lat_start)) * cos(radians(lat_end))
      |           * pow(sin((radians(lon_end) - radians(lon_start)) / 2), 2)
      |       )), 3)) AS distance_km,
      |       (distance IS NULL
      |        AND lat_start IS NOT NULL AND lon_start IS NOT NULL
      |        AND lat_end IS NOT NULL AND lon_end IS NOT NULL) AS was_candidate
      |FROM r ORDER BY uid""".stripMargin

  // --------------------------------------------------------------------
  // q119 — per-metric range time series (A17, reference web/js/app.js:
  // 141–149): the last RangeMetrics surface under the oracle —
  // DailyMetrics.allDays rolled up per day, RangeMetrics.series
  // projecting (date, metric) over the requested range, nulls → 0 like
  // the browser's chart feed.
  def q119(s: SparkSession, dir: String): DataFrame = {
    val daily = graft.metrics.DailyMetrics.allDays(ridesFromEvents(s, dir))
    graft.metrics.RangeMetrics
      .series(daily, "2024-01-05", "2024-01-20", "total_rides")
  }

  val q119Sql: String =
    s"""WITH $ridesFromEventsSql,
       | d AS (SELECT strftime(CAST(start_time AS DATE), '%Y-%m-%d') AS date,
       |              count(*) AS total_rides
       |       FROM b GROUP BY 1)
       |SELECT date, total_rides FROM d
       |WHERE date BETWEEN '2024-01-05' AND '2024-01-20'
       |ORDER BY date""".stripMargin

  /** Name → query function, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01 _),
    "q02_filter_project" -> (q02 _),
    "q03_broadcast_join" -> (q03 _),
    "q04_full_outer_topk" -> (q04 _),
    "q05_anti_join" -> (q05 _),
    "q06_union_distinct" -> (q06 _),
    "q07_hourly_histogram" -> (q07 _),
    "q08_conditional_counts" -> (q08 _),
    "q09_distinct_days" -> (q09 _),
    "q10_latest_day" -> (q10 _),
    "q11_top_routes" -> (q11 _),
    "q12_range_reagg" -> (q12 _),
    "q13_string_clean" -> (q13 _),
    "q14_json_extract" -> (q14 _),
    "q15_haversine" -> (q15 _),
    "q16_status_diff" -> (q16 _),
    "q17_idempotent_append" -> (q17 _),
    "q30_snapshot_diff_fullouter" -> (q30 _),
    "q33_daily_metrics_alldays" -> (q33 _),
    "q34_range_busiest_rerank" -> (q34 _),
    "q35_range_histogram_avg" -> (q35 _),
    "q36_windowed_traffic" -> (q36 _),
    "q37_range_top_routes" -> (q37 _),
    "q118_backfill_distance" -> (q118 _),
    "q119_range_series" -> (q119 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_broadcast_join" -> q03Sql,
    "q04_full_outer_topk" -> q04Sql,
    "q05_anti_join" -> q05Sql,
    "q06_union_distinct" -> q06Sql,
    "q07_hourly_histogram" -> q07Sql,
    "q08_conditional_counts" -> q08Sql,
    "q09_distinct_days" -> q09Sql,
    "q10_latest_day" -> q10Sql,
    "q11_top_routes" -> q11Sql,
    "q12_range_reagg" -> q12Sql,
    "q13_string_clean" -> q13Sql,
    "q14_json_extract" -> q14Sql,
    "q15_haversine" -> q15Sql,
    "q16_status_diff" -> q16Sql,
    "q17_idempotent_append" -> q17Sql,
    "q30_snapshot_diff_fullouter" -> q30Sql,
    "q33_daily_metrics_alldays" -> q33Sql,
    "q34_range_busiest_rerank" -> q34Sql,
    "q35_range_histogram_avg" -> q35Sql,
    "q36_windowed_traffic" -> q36Sql,
    "q37_range_top_routes" -> q37Sql,
    "q118_backfill_distance" -> q118Sql,
    "q119_range_series" -> q119Sql
  )
}
