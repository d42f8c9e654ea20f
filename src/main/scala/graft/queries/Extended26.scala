package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Exact
import graft.functions.TextFns

/** Round-15 batch (q244–q251): the statistics shelf a curation team
  * runs to TRUST its other read-outs — rank association, conformal
  * calibration, resampling uncertainty, and robust/concentration
  * summaries. All integer-exact (ppm/micro/nano by integer division,
  * per-row floors before exact DECIMAL sums), every global rank via
  * the two-pass [[graft.operators.GlobalRank]] (never a single-task
  * window), every "random" draw a shared deterministic integer LCG
  * both engines replay literally.
  *
  *  - q244 Spearman rank correlation (length vs token count) with
  *    average-rank ties, exact Pearson-on-double-ranks fold;
  *  - q245 split-conformal nonconformity threshold at α = 0.1: the
  *    ⌈(n+1)(1−α)⌉-th smallest score by exact global rank selection,
  *    plus realized coverage;
  *  - q246 jackknife standard error of the corpus chars-per-token
  *    RATIO — leave-one-out replicas fold from the totals in ONE
  *    scan (r_{−i} = (X−x_i)/(Y−y_i)), never n rescans;
  *  - q247 Poisson(1) bootstrap of mean document length: B = 16
  *    replicate weighted means from hash-free LCG draws (the scale
  *    trick: each row carries its own replicate weights — no
  *    resampling shuffle exists at all);
  *  - q248 dedup yield curve: duplicate-cluster size histogram over
  *    the q61 LSH + connected-components pipeline;
  *  - q249 Lorenz curve by deciles (the distributional view q232's
  *    one-number Gini summarizes);
  *  - q250 HHI source concentration + effective source count;
  *  - q251 trimmed and winsorized mean length (robust location, exact
  *    rank cuts).
  */
object Extended26 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------------
  // q244 — Spearman rank correlation between document length and token
  // count, exact ppm (average ranks for ties via the double-rank
  // device). Delegates to Stats.spearmanRho: ONE corpus fold to the
  // (length, token-count) PAIR histogram, double ranks from that
  // histogram's marginal prefix sums, every join histogram-sized —
  // the corpus is never joined back onto (the r15/r16 join-free
  // discipline shared with q253/q277).
  def q244(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.ext.Stats.spearmanRho(
      t(s, dir, "documents").select($"n_chars".cast("long").as("x"),
        size(TextFns.tokens($"text")).cast("long").as("y")),
      "x", "y")
  }

  val q244Sql: String =
    s"""WITH tk AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
       |    CAST(len(${DocOps.tokensSql}) AS BIGINT) AS y FROM documents),
       | rx AS (SELECT x, MIN(rk) + MAX(rk) AS drx FROM (
       |     SELECT x, row_number() OVER (ORDER BY x, doc_id) AS rk
       |     FROM tk) GROUP BY x),
       | ry AS (SELECT y, MIN(rk) + MAX(rk) AS dry FROM (
       |     SELECT y, row_number() OVER (ORDER BY y, doc_id) AS rk
       |     FROM tk) GROUP BY y),
       | f AS (SELECT CAST(count(*) AS HUGEINT) AS n,
       |     CAST(sum(drx) AS HUGEINT) AS sx,
       |     CAST(sum(dry) AS HUGEINT) AS sy,
       |     CAST(sum(CAST(drx AS HUGEINT) * drx) AS HUGEINT) AS sxx,
       |     CAST(sum(CAST(dry AS HUGEINT) * dry) AS HUGEINT) AS syy,
       |     CAST(sum(CAST(drx AS HUGEINT) * dry) AS HUGEINT) AS sxy
       |   FROM tk JOIN rx USING (x) JOIN ry USING (y))
       |SELECT CAST(n AS BIGINT) AS n,
       |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN 0
       |  ELSE CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE) /
       |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
       |     * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       |    * 1000000.0 + 0.5) AS BIGINT) END AS spearman_ppm
       |FROM f""".stripMargin

  // --------------------------------------------------------------------
  // q245 — split-conformal prediction threshold at α = 0.1 over the
  // centroid classifier's nonconformity scores (1e6 − confidence,
  // micro). The finite-sample guarantee needs EXACTLY the
  // ⌈(n+1)(1−α)⌉-th smallest score — an exact global rank selection
  // (GlobalRank two-pass, deterministic (score, vec_id) tie-break),
  // not an approximate percentile. k is pure integer arithmetic
  // (⌈a/10⌉ = (a+9) div 10), capped at n for tiny calibration sets.
  // Realized coverage rides along: share of scores ≤ q̂.
  def q245(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nc = graft.ext.Eval.centroidScoredPredictions(
        t(s, dir, "embeddings"), "embedding", "label")
      .select($"vec_id", (lit(1000000L) - $"conf_micro").as("nc"))
    val ranked = graft.operators.GlobalRank.withRank(
        nc, Seq($"nc", $"vec_id"), rankCol = "rk")
      .localCheckpoint() // feeds the pick AND the coverage fold
    val tot = ranked.agg(count(lit(1)).as("n"))
      .select($"n", least(expr("((n + 1) * 9 + 9) div 10"), $"n").as("k"))
    val qhat = ranked.crossJoin(tot).filter($"rk" === $"k")
      .select($"nc".as("qhat_micro"))
    ranked.crossJoin(qhat)
      .agg(count(lit(1)).as("n"),
        sum(when($"nc" <= $"qhat_micro", 1L).otherwise(0L)).as("nle"),
        first($"qhat_micro").as("qhat_micro"))
      .crossJoin(tot.select($"k"))
      .select($"n", $"k", $"qhat_micro",
        expr("(nle * 1000000) div n").as("cov_ppm"))
  }

  val q245Sql: String =
    s"""WITH ${CentroidPredOracle.chain},
       | nc AS (SELECT vec_id,
       |     1000000 - CAST(floor(score * 1000000.0 + 0.5) AS BIGINT) AS nc
       |   FROM pred),
       | r AS (SELECT nc, row_number() OVER (ORDER BY nc, vec_id) AS rk
       |       FROM nc),
       | tt AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |     least(((count(*) + 1) * 9 + 9) // 10, count(*)) AS k FROM nc),
       | q AS (SELECT r.nc AS qhat FROM r CROSS JOIN tt WHERE r.rk = tt.k),
       | c AS (SELECT CAST(count(*) AS BIGINT) AS nle
       |       FROM nc CROSS JOIN q WHERE nc.nc <= q.qhat)
       |SELECT tt.n, CAST(tt.k AS BIGINT) AS k, q.qhat AS qhat_micro,
       |  CAST((c.nle * 1000000) // tt.n AS BIGINT) AS cov_ppm
       |FROM tt CROSS JOIN q CROSS JOIN c""".stripMargin

  // --------------------------------------------------------------------
  // q246 — jackknife standard error of the corpus chars-per-token
  // RATIO. A ratio's uncertainty has no closed variance; the jackknife
  // replica r_{−i} = (X−x_i)/(Y−y_i) folds from the grand totals, so
  // the "n leave-one-out recomputations" are ONE scan: totals (one
  // aggregation, broadcast as a 1-row frame), then per-row replica,
  // nano-floored BEFORE the exact DECIMAL sums (partial-agg order
  // can't move a digit), then SE = sqrt((n−1)·(n·Σt² − (Σt)²))/n.
  // Contract: n ≥ 2 and every document has ≥ 1 token (Y − y_i > 0);
  // a violation divides by zero and fails loudly under ANSI.
  def q246(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .select($"n_chars".cast("long").as("x"),
        size(TextFns.tokens($"text")).cast("long").as("y"))
    val tot = d.agg(sum($"x").as("xx"), sum($"y").as("yy"))
    val f = d.crossJoin(tot)
      .select(floor(($"xx" - $"x").cast("double") /
        ($"yy" - $"y").cast("double") * 1000000000.0 + 0.5)
        .cast("long").as("t"))
      .agg(count(lit(1)).as("n"), Exact.decSum($"t").as("st"),
        Exact.decSum(Exact.dec($"t") * $"t").as("stt"))
    f.crossJoin(tot)
      .select($"n",
        expr(s"(CAST(xx AS ${Exact.Dec}) * 1000000000) div yy")
          .as("ratio_nano"),
        expr("st div n").as("mean_loo_nano"),
        expr(s"CAST(floor(sqrt(CAST((n - 1) *" +
          s" (CAST(n AS ${Exact.Dec}) * stt - st * st) AS DOUBLE))" +
          " / n + 0.5) AS BIGINT)").as("se_jack_nano"))
  }

  val q246Sql: String =
    s"""WITH d AS (SELECT CAST(n_chars AS BIGINT) AS x,
       |    CAST(len(${DocOps.tokensSql}) AS BIGINT) AS y FROM documents),
       | tot AS (SELECT CAST(sum(x) AS BIGINT) AS xx,
       |         CAST(sum(y) AS BIGINT) AS yy FROM d),
       | f AS (SELECT CAST(count(*) AS HUGEINT) AS n,
       |     CAST(sum(t) AS HUGEINT) AS st,
       |     CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt FROM (
       |       SELECT CAST(floor(CAST(xx - x AS DOUBLE) /
       |           CAST(yy - y AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT)
       |         AS t
       |       FROM d CROSS JOIN tot))
       |SELECT CAST(n AS BIGINT) AS n,
       |  CAST((CAST(xx AS HUGEINT) * 1000000000) // yy AS BIGINT)
       |    AS ratio_nano,
       |  CAST(st // n AS BIGINT) AS mean_loo_nano,
       |  CAST(floor(sqrt(CAST((n - 1) * (n * stt - st * st) AS DOUBLE))
       |    / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS se_jack_nano
       |FROM f CROSS JOIN tot""".stripMargin

  // --------------------------------------------------------------------
  // q247 — Poisson(1) bootstrap of the mean document length, B = 16
  // replicates. The scale form of the bootstrap: resampling-with-
  // replacement at corpus scale is a shuffle per replicate, but a
  // Poisson(1) weight per (row, replicate) is distributionally the
  // bootstrap at large n and needs NO data movement — each row emits
  // its 16 weighted contributions in the same scan, and each
  // replicate folds map-side. Draws come from a two-round LCG on
  // (doc_id·16 + b) — shared INTEGER arithmetic both engines replay
  // literally (no engine hash, no float) — inverted through the exact
  // integer thresholds floor(F_Poisson(1)(k)·2³¹).
  private val BootReps = 16

  /** Cumulative-Poisson(1) thresholds in [0, 2³¹): computed once and
    * interpolated into BOTH engines' expressions, so equality is by
    * construction. Mass beyond k = 6 (< 1e-4) truncates to 7. */
  private val PoisThresholds: Seq[Long] = {
    val e1 = math.exp(-1.0)
    var fact = 1.0
    var cum = 0.0
    (0 to 6).map { k =>
      if (k > 0) fact *= k
      cum += e1 / fact
      math.floor(cum * 2147483648.0).toLong
    }
  }

  /** The shared draw: SQL fragment valid in BOTH Spark SQL and DuckDB.
    * The seed is reduced mod 2³¹ BEFORE the first multiply (the
    * [[graft.ext.Stats.lcgU31Sql]] discipline): without it the
    * product 1103515245·seed overflows BIGINT past doc_id ≈ 5.2·10⁸
    * — three orders of magnitude under the design scale. */
  private def poisWeightSql(seed: String): String = {
    val x0 = s"(($seed) % 2147483648)"
    val x1 = s"(1103515245 * $x0 + 12345) % 2147483648"
    val x2 = s"(1103515245 * ($x1) + 12345) % 2147483648"
    val cases = PoisThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN ($x2) < $t THEN ${k}" }
      .mkString(" ")
    s"CAST(CASE $cases ELSE 7 END AS BIGINT)"
  }

  def q247(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", $"n_chars".cast("long").as("x"))
      .select($"x", explode(expr(
        s"transform(sequence(0, ${BootReps - 1})," +
          s" b -> named_struct('b', CAST(b AS BIGINT)," +
          s" 'w', ${poisWeightSql(s"doc_id * $BootReps + b")}))")).as("p"))
      .groupBy($"p.b".as("b"))
      .agg(sum($"p.w").as("n_eff"),
        Exact.decSum($"p.w" * $"x").as("wx"))
      .select($"b", $"n_eff",
        expr("CASE WHEN n_eff > 0 THEN (wx * 1000000) div n_eff" +
          " ELSE 0L END").as("mean_micro"))
      .orderBy($"b")
  }

  val q247Sql: String =
    s"""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS x
       |           FROM documents),
       | w AS (SELECT t.b, d.x,
       |     ${poisWeightSql(s"d.doc_id * $BootReps + t.b")} AS w
       |   FROM d CROSS JOIN generate_series(0, ${BootReps - 1}) t(b))
       |SELECT CAST(b AS BIGINT) AS b, CAST(sum(w) AS BIGINT) AS n_eff,
       |  CASE WHEN sum(w) > 0 THEN
       |    CAST((CAST(sum(CAST(w AS HUGEINT) * x) AS HUGEINT) * 1000000)
       |      // CAST(sum(w) AS HUGEINT) AS BIGINT)
       |  ELSE 0 END AS mean_micro
       |FROM w GROUP BY b ORDER BY b""".stripMargin

  // --------------------------------------------------------------------
  // q248 — dedup yield curve: the duplicate-cluster size histogram
  // over the q61 pipeline (LSH candidates → connected components).
  // The histogram is what prices a dedup run: Σ (size−1)·n_clusters
  // docs removed, and a heavy tail (one giant cluster) is the
  // starCap/mega-cluster hazard surfacing in data rather than in an
  // OOM. Two tiny aggregations over the component assignment.
  def q248(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val pairs = graft.ext.TextDedup.lshCandidates(
      docs, "text", "doc_id", ngram = 3, numHashes = 4, bands = 1)
    graft.ext.TextDedup
      .connectedComponents(pairs, docs.select($"doc_id"), nodeCol = "doc_id")
      .groupBy($"component").agg(count(lit(1)).as("sz"))
      .groupBy($"sz".as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select($"cluster_size", $"n_clusters",
        (($"cluster_size" - 1) * $"n_clusters").as("docs_dropped"))
      .orderBy($"cluster_size")
  }

  val q248Sql: String = {
    val ng = DocOps.ngramsSql(3)
    s"""WITH RECURSIVE sig AS (
       | SELECT doc_id,
       |  ${DocOps.minhashChunkSql(ng, 0)} || '|' ||
       |  ${DocOps.minhashChunkSql(ng, 1)} || '|' ||
       |  ${DocOps.minhashChunkSql(ng, 2)} || '|' ||
       |  ${DocOps.minhashChunkSql(ng, 3)} AS band
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
       | comp AS (SELECT d.doc_id AS node,
       |     least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS component
       |   FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
       |   GROUP BY d.doc_id),
       | szs AS (SELECT component, CAST(count(*) AS BIGINT) AS sz
       |         FROM comp GROUP BY component)
       |SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST((sz - 1) * count(*) AS BIGINT) AS docs_dropped
       |FROM szs GROUP BY sz ORDER BY cluster_size""".stripMargin
  }

  // --------------------------------------------------------------------
  // q249 — Lorenz curve by length deciles: the distributional view
  // behind q232's one-number Gini (which deciles hold the mass, where
  // curation should look first). Deciles via the two-pass
  // GlobalRank.withNtile (ntile semantics exactly — never a
  // single-task window over the corpus); the cumulative fold then
  // runs on TEN rows, where a window is metadata, not data.
  def q249(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val binned = graft.operators.GlobalRank.withNtile(
      t(s, dir, "documents").select($"doc_id", $"n_chars"),
      Seq($"n_chars", $"doc_id"), tiles = 10, tileCol = "decile")
    val per = binned.groupBy($"decile")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars".cast("long")).as("chars"))
    // 10-row frame: the cumulative window is driver-scale by now
    val w = Window.orderBy($"decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("cum", sum($"chars").over(w))
      .crossJoin(per.agg(sum($"chars").as("total")))
      .select($"decile", $"n_docs", $"chars",
        expr(s"(CAST(cum AS ${Exact.Dec}) * 1000000) div total")
          .as("cum_share_ppm"))
      .orderBy($"decile")
  }

  val q249Sql: String =
    """WITH b AS (SELECT ntile(10) OVER (ORDER BY n_chars, doc_id)
      |    AS decile, CAST(n_chars AS BIGINT) AS x FROM documents),
      | per AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(x) AS BIGINT) AS chars FROM b GROUP BY decile),
      | tot AS (SELECT CAST(sum(chars) AS HUGEINT) AS total FROM per)
      |SELECT CAST(decile AS INTEGER) AS decile, n_docs, chars,
      |  CAST((CAST(sum(chars) OVER (ORDER BY decile) AS HUGEINT)
      |    * 1000000) // total AS BIGINT) AS cum_share_ppm
      |FROM per CROSS JOIN tot ORDER BY decile""".stripMargin

  // --------------------------------------------------------------------
  // q250 — Herfindahl–Hirschman concentration of sources by character
  // mass, plus the effective source count 1/HHI (in milli): "is this
  // corpus really 8 sources, or 2.3 sources wearing 8 names?". One
  // shuffle on the tiny source key; the squared fold runs in DECIMAL
  // (Σ c² is corpus²-magnitude).
  def q250(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .groupBy($"source").agg(sum($"n_chars".cast("long")).as("c"))
      .agg(count(lit(1)).as("n_sources"), sum($"c").as("total_chars"),
        Exact.decSum(Exact.dec($"c") * $"c").as("s2"))
      .select($"n_sources", $"total_chars",
        expr(s"(s2 * 1000000) div (CAST(total_chars AS ${Exact.Dec})" +
          " * total_chars)").as("hhi_ppm"),
        expr(s"(CAST(total_chars AS ${Exact.Dec}) * total_chars * 1000)" +
          " div s2").as("eff_sources_milli"))
  }

  val q250Sql: String =
    """WITH per AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS c
      |             FROM documents GROUP BY source),
      | f AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,
      |      CAST(sum(c) AS BIGINT) AS total_chars,
      |      CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2 FROM per)
      |SELECT n_sources, total_chars,
      |  CAST((s2 * 1000000) // (CAST(total_chars AS HUGEINT)
      |    * total_chars) AS BIGINT) AS hhi_ppm,
      |  CAST((CAST(total_chars AS HUGEINT) * total_chars * 1000) // s2
      |    AS BIGINT) AS eff_sources_milli
      |FROM f""".stripMargin

  // --------------------------------------------------------------------
  // q251 — trimmed (5% each tail) and winsorized mean document length:
  // the robust location pair every per-source length dashboard should
  // quote next to the raw mean. Exact rank cuts via GlobalRank
  // (k_lo = ⌊n·5/100⌋ rows dropped/clamped per tail — integer
  // arithmetic, deterministic (value, doc_id) order), sums exact.
  def q251(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ranked = graft.operators.GlobalRank.withRank(
        t(s, dir, "documents").select($"doc_id",
          $"n_chars".cast("long").as("x")),
        Seq($"x", $"doc_id"), rankCol = "rk")
      .localCheckpoint() // feeds the bounds pick AND both folds
    val tot = ranked.agg(count(lit(1)).as("n"))
      .select($"n", expr("(n * 5) div 100").as("klo"))
      .select($"n", $"klo", ($"n" - $"klo").as("khi"))
    val bounds = ranked.crossJoin(tot)
      .filter($"rk" === $"klo" + 1 || $"rk" === $"khi")
      .agg(min(when($"rk" === $"klo" + 1, $"x")).as("lo"),
        max(when($"rk" === $"khi", $"x")).as("hi"))
    ranked.crossJoin(tot).crossJoin(bounds)
      .agg(first($"n").as("n"),
        sum(when($"rk" > $"klo" && $"rk" <= $"khi", 1L).otherwise(0L))
          .as("n_trimmed"),
        Exact.decSum(when($"rk" > $"klo" && $"rk" <= $"khi", $"x")
          .otherwise(lit(0L))).as("tsum"),
        Exact.decSum(greatest(least($"x", $"hi"), $"lo")).as("wsum"),
        first($"lo").as("lo_chars"), first($"hi").as("hi_chars"))
      .select($"n", $"n_trimmed",
        expr("CASE WHEN n_trimmed > 0 THEN (tsum * 1000000) div n_trimmed" +
          " ELSE 0L END").as("trimmed_mean_micro"),
        expr("(wsum * 1000000) div n").as("winsor_mean_micro"),
        $"lo_chars", $"hi_chars")
  }

  val q251Sql: String =
    """WITH r AS (SELECT CAST(n_chars AS BIGINT) AS x,
      |    row_number() OVER (ORDER BY n_chars, doc_id) AS rk
      |  FROM documents),
      | tt AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |        (count(*) * 5) // 100 AS klo,
      |        count(*) - (count(*) * 5) // 100 AS khi FROM r),
      | bd AS (SELECT
      |     min(CASE WHEN rk = klo + 1 THEN x END) AS lo,
      |     max(CASE WHEN rk = khi THEN x END) AS hi
      |   FROM r CROSS JOIN tt WHERE rk = klo + 1 OR rk = khi)
      |SELECT tt.n,
      |  CAST(sum(CASE WHEN rk > klo AND rk <= khi THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_trimmed,
      |  CASE WHEN sum(CASE WHEN rk > klo AND rk <= khi THEN 1 ELSE 0 END)
      |      > 0 THEN
      |    CAST((CAST(sum(CASE WHEN rk > klo AND rk <= khi THEN x
      |        ELSE 0 END) AS HUGEINT) * 1000000)
      |      // sum(CASE WHEN rk > klo AND rk <= khi THEN 1 ELSE 0 END)
      |      AS BIGINT)
      |  ELSE 0 END AS trimmed_mean_micro,
      |  CAST((CAST(sum(greatest(least(x, bd.hi), bd.lo)) AS HUGEINT)
      |    * 1000000) // tt.n AS BIGINT) AS winsor_mean_micro,
      |  bd.lo AS lo_chars, bd.hi AS hi_chars
      |FROM r CROSS JOIN tt CROSS JOIN bd
      |GROUP BY tt.n, bd.lo, bd.hi""".stripMargin

  /** Name → query, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q244_spearman_rho" -> (q244 _),
    "q245_conformal_threshold" -> (q245 _),
    "q246_jackknife_ratio_se" -> (q246 _),
    "q247_poisson_bootstrap" -> (q247 _),
    "q248_dedup_yield_curve" -> (q248 _),
    "q249_lorenz_deciles" -> (q249 _),
    "q250_source_hhi" -> (q250 _),
    "q251_robust_mean" -> (q251 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q244_spearman_rho" -> q244Sql,
    "q245_conformal_threshold" -> q245Sql,
    "q246_jackknife_ratio_se" -> q246Sql,
    "q247_poisson_bootstrap" -> q247Sql,
    "q248_dedup_yield_curve" -> q248Sql,
    "q249_lorenz_deciles" -> q249Sql,
    "q250_source_hhi" -> q250Sql,
    "q251_robust_mean" -> q251Sql
  )
}
