package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 batch (q278–q281): sequential change detection on the
  * shared daily frame, and a coverage read-out per source.
  *
  *  - q278 Pettitt change-point test — the rank-based (distribution-
  *    free) regime-shift detector a single burst day cannot fake,
  *    folded in O(m) via the double-rank mid-rank identity
  *    ([[graft.ext.Stats.pettittChangePoint]]);
  *  - q279 Page–Hinkley drawup — the sequential "sustained increase"
  *    statistic (max rise of the centered cumsum above its running
  *    minimum), the monitor-shaped companion to q273's single-peak
  *    CUSUM;
  *  - q280 per-source Good–Turing unseen mass — the share of each
  *    source's token occurrences held by hapax types (V₁/N, the
  *    Good–Turing estimate of UNSEEN probability mass): the "is this
  *    source's vocabulary saturated yet" curation dial;
  *  - q281 weekday seasonality strength — η² of day-of-week on the
  *    daily volume (how much of ingestion variance the weekly rhythm
  *    explains), composing q276's ANOVA fold onto the day frame.
  *
  * q278/q279/q281 all read [[Extended28.dailySeries]]'s memoized day
  * frame: ONE events scan feeds the whole shelf.
  */
object Extended29 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------------
  // q278 — Pettitt change-point on daily event volume.
  def q278(s: SparkSession, dir: String): DataFrame =
    graft.ext.Stats.pettittChangePoint(
      Extended28.dailySeries(s, dir), "day", "cnt")

  val q278Sql: String =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
      |     CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
      | m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM daily),
      | r AS (SELECT day, x, row_number() OVER (ORDER BY x, day) AS rk
      |       FROM daily),
      | dr AS (SELECT x, MIN(rk) + MAX(rk) AS dr FROM r GROUP BY x),
      | u AS (SELECT r.day, row_number() OVER (ORDER BY r.day) AS tpos,
      |         sum(dr.dr) OVER (ORDER BY r.day) AS pref
      |       FROM r JOIN dr USING (x)),
      | uu AS (SELECT day, tpos, pref - tpos * (m + 1) AS u
      |        FROM u CROSS JOIN m),
      | pick AS (SELECT uu.day, abs(uu.u) AS k FROM uu CROSS JOIN m
      |          WHERE uu.tpos < m.m ORDER BY abs(uu.u) DESC, uu.day ASC
      |          LIMIT 1)
      |SELECT m.m AS n_periods, pick.day AS change_t,
      |  CAST(pick.k AS BIGINT) AS k_stat,
      |  least(1000000, CAST(floor(2.0
      |    * exp(-6.0 * CAST(pick.k AS DOUBLE) * pick.k
      |      / (CAST(m.m AS DOUBLE) * m.m * m.m
      |        + CAST(m.m AS DOUBLE) * m.m))
      |    * 1000000.0 + 0.5) AS BIGINT)) AS p_ppm
      |FROM pick CROSS JOIN m""".stripMargin

  // --------------------------------------------------------------------
  // q279 — Page–Hinkley drawup on daily event volume.
  def q279(s: SparkSession, dir: String): DataFrame =
    graft.ext.Stats.pageHinkleyDrawup(
      Extended28.dailySeries(s, dir), "day", "cnt")

  val q279Sql: String =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
      |     CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
      | tot AS (SELECT CAST(count(*) AS HUGEINT) AS n,
      |         CAST(sum(x) AS HUGEINT) AS sx FROM daily),
      | r AS (SELECT day, CAST(n * x - sx AS HUGEINT) AS d
      |       FROM daily CROSS JOIN tot),
      | cs AS (SELECT day, sum(d) OVER (ORDER BY day) AS cs FROM r),
      | dd AS (SELECT day, cs - min(cs) OVER (ORDER BY day) AS dup
      |        FROM cs),
      | pick AS (SELECT day, dup FROM dd
      |          ORDER BY dup DESC, day ASC LIMIT 1)
      |SELECT CAST(tot.n AS BIGINT) AS n_periods, pick.day AS peak_t,
      |  CASE WHEN tot.sx <= 0 THEN 0
      |  ELSE CAST((pick.dup * 1000000) // (tot.n * tot.sx) AS BIGINT)
      |  END AS ph_ppm
      |FROM pick CROSS JOIN tot""".stripMargin

  // --------------------------------------------------------------------
  // q280 — per-source Good–Turing unseen mass: hapax occurrences over
  // total occurrences, by source. One tokenize + one (source, type)
  // fold; the per-source read-outs are re-aggregations of the bounded
  // TYPE frame.
  def q280(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = t(s, dir, "documents")
      .select($"source",
        explode(graft.functions.TextFns.tokens($"text")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
    types.groupBy($"source")
      .agg(sum($"c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when($"c" === 1, 1L).otherwise(0L)).as("v1"))
      .select($"source", $"n_tokens", $"n_types", $"v1",
        expr(s"(CAST(v1 AS ${graft.ext.Exact.Dec}) * 1000000)" +
          " div n_tokens").as("unseen_ppm"))
      .orderBy($"source")
  }

  val q280Sql: String =
    s"""WITH tk AS (SELECT source, unnest(${DocOps.tokensSql}) AS tok
       |            FROM documents),
       | ty AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
       |        FROM tk GROUP BY 1, 2)
       |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
       |  CAST(count(*) AS BIGINT) AS n_types,
       |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
       |  CAST((CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS HUGEINT)
       |    * 1000000) // sum(c) AS BIGINT) AS unseen_ppm
       |FROM ty GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // q281 — weekday seasonality strength: η² of day-of-week on daily
  // volume. Group encodings differ across engines (Spark dayofweek is
  // 1–7, DuckDB 0–6) but η² only needs the PARTITION, which is
  // identical.
  def q281(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.ext.Stats.etaSquared(
      Extended28.dailySeries(s, dir)
        .select(dayofweek($"day").as("dow"), $"cnt"),
      "cnt", "dow")
  }

  val q281Sql: String =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
      |     CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
      | g AS (SELECT x, CAST(dayofweek(day) AS BIGINT) AS grp
      |       FROM daily),
      | per AS (SELECT grp, CAST(count(*) AS HUGEINT) AS ng,
      |         CAST(sum(x) AS HUGEINT) AS sg FROM g GROUP BY grp),
      | a AS (SELECT CAST(sum((sg * sg * 1000000) // ng) AS HUGEINT)
      |         AS a,
      |       CAST(count(*) AS BIGINT) AS n_groups,
      |       CAST(sum(ng) AS HUGEINT) AS n,
      |       CAST(sum(sg) AS HUGEINT) AS ss FROM per),
      | sq AS (SELECT CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
      |        AS sxx FROM g),
      | e AS (SELECT CAST(n AS BIGINT) AS n, n_groups,
      |     a - (ss * ss * 1000000) // n AS ssb,
      |     sxx * 1000000 - (ss * ss * 1000000) // n AS sst
      |   FROM a CROSS JOIN sq)
      |SELECT n, n_groups,
      |  CASE WHEN sst <= 0 THEN 0
      |  ELSE least(1000000, greatest(0,
      |    CAST((ssb * 1000000) // sst AS BIGINT))) END AS eta2_ppm
      |FROM e""".stripMargin

  // --------------------------------------------------------------------
  // q282 — winnowing fingerprint overlap: document pairs sharing ≥ 3
  // selected fingerprints (k=4 grams, w=5 windows — any common run of
  // ≥ 8 tokens is guaranteed a shared fingerprint). Hot fingerprints
  // (df > 50 docs: boilerplate) are dropped before the pair join, the
  // LSH starCap discipline — the join volume is Σ df² over RARE
  // fingerprints only.
  private val WinK = 4
  private val WinW = 5
  private val WinMaxDf = 50
  private val WinMinShared = 3

  def q282(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fp = graft.ext.TextDedup.winnowFingerprints(
      t(s, dir, "documents"), "doc_id", "text", k = WinK, w = WinW)
    val rare = fp.groupBy($"fingerprint")
      .agg(count(lit(1)).as("df")).filter($"df" <= WinMaxDf)
      .select($"fingerprint")
    val f2 = fp.join(rare, Seq("fingerprint"), "left_semi")
    val b = f2.select($"fingerprint", $"doc_id".as("doc_b"))
    f2.join(b, Seq("fingerprint"))
      .filter($"doc_id" < $"doc_b")
      .groupBy($"doc_id".as("doc_a"), $"doc_b")
      .agg(count(lit(1)).as("shared"))
      .filter($"shared" >= WinMinShared)
      .orderBy($"doc_a", $"doc_b")
  }

  val q282Sql: String = {
    val i = s"i + ${WinK - 1}"
    s"""WITH tk AS (SELECT doc_id, ${DocOps.tokensSql} AS toks
       |            FROM documents),
       | hs AS (SELECT doc_id, list_transform(
       |          generate_series(1, len(toks) - ${WinK - 1}),
       |          i -> md5(array_to_string(list_slice(toks, i, $i),
       |            ' '))) AS h
       |        FROM tk WHERE len(toks) >= ${WinK + WinW - 1}),
       | fp AS (SELECT DISTINCT doc_id, unnest(list_transform(
       |          generate_series(1, len(h) - ${WinW - 1}),
       |          q -> list_min(list_slice(h, q, q + ${WinW - 1}))))
       |            AS fingerprint
       |        FROM hs),
       | rare AS (SELECT fingerprint FROM fp GROUP BY fingerprint
       |          HAVING count(*) <= $WinMaxDf),
       | f2 AS (SELECT fp.doc_id, fp.fingerprint
       |        FROM fp JOIN rare USING (fingerprint))
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(count(*) AS BIGINT) AS shared
       |FROM f2 a JOIN f2 b
       |  ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= $WinMinShared
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // --------------------------------------------------------------------
  // q283 — robust (median/MAD) outlier days of event volume: the
  // burst-day count a mean/stddev fence cannot see past (the burst
  // inflates the stddev meant to flag it). Exact rank-selected lower
  // medians, integer fence dev > 5·MAD; same shared day frame.
  def q283(s: SparkSession, dir: String): DataFrame =
    graft.ext.Stats.madOutliers(
      Extended28.dailySeries(s, dir), "day", "cnt", factor = 5L)

  val q283Sql: String =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
      |     CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
      | m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM daily),
      | med AS (SELECT x AS med FROM (SELECT x,
      |       row_number() OVER (ORDER BY x, day) AS rk FROM daily)
      |     CROSS JOIN m WHERE rk = (m + 1) // 2),
      | dev AS (SELECT day, med, abs(x - med) AS dev
      |         FROM daily CROSS JOIN med),
      | mad AS (SELECT dev AS mad FROM (SELECT dev,
      |       row_number() OVER (ORDER BY dev, day) AS rk FROM dev)
      |     CROSS JOIN m WHERE rk = (m + 1) // 2)
      |SELECT CAST(count(*) AS BIGINT) AS n_periods,
      |  CAST(min(med) AS BIGINT) AS med, CAST(min(mad) AS BIGINT) AS mad,
      |  CAST(coalesce(sum(CASE WHEN dev > mad * 5 THEN 1 ELSE 0 END), 0)
      |    AS BIGINT) AS n_outliers
      |FROM dev CROSS JOIN mad""".stripMargin

  /** Name → query, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q282_winnow_overlap" -> (q282 _),
    "q283_mad_outlier_days" -> (q283 _),
    "q278_pettitt_changepoint" -> (q278 _),
    "q279_page_hinkley" -> (q279 _),
    "q280_good_turing_mass" -> (q280 _),
    "q281_weekday_seasonality" -> (q281 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q282_winnow_overlap" -> q282Sql,
    "q283_mad_outlier_days" -> q283Sql,
    "q278_pettitt_changepoint" -> q278Sql,
    "q279_page_hinkley" -> q279Sql,
    "q280_good_turing_mass" -> q280Sql,
    "q281_weekday_seasonality" -> q281Sql
  )
}
