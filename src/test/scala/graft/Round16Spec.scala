package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Stats

/** Round-16 regressions.
  *
  * 1. The silent BIGINT wrap in the kruskalWallis / etaSquared
  *    per-group folds: `(x² · 10⁶) div n_g` narrowed through Spark's
  *    IntegralDivide, which (verified on this build, ANSI on) WRAPS
  *    with no error once the quotient exceeds 2⁶³ — for KW that is
  *    only n ≈ 4·10⁴ rows over 5 uniform groups, for η² with mean
  *    value ~10⁵ only ~10³ rows per group. Both fixtures here sit
  *    PAST the old wrap point and are pinned against a BigInt brute
  *    that replays the documented floor arithmetic digit for digit.
  *
  * 2. The per-value rank frame in mannWhitneyZ / kruskalWallis is
  *    broadcast only under the (default) bounded-value-domain
  *    contract; `boundedValueDomain = false` must take a shuffle join
  *    (no BroadcastHashJoin anywhere under threshold = -1) and return
  *    the identical row — the gramPrefix mutual-exclusion law.
  */
class Round16Spec extends SparkSpec {

  private def withSQLConf[T](kv: (String, String)*)(f: => T): T = {
    val conf = spark.conf
    val saved = kv.map { case (k, _) => k -> conf.getOption(k) }
    kv.foreach { case (k, v) => conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  // ------------------------------------------------------------------
  // 1a. kruskalWallis past the old 2^63 div-wrap point.

  test("kruskalWallis is exact past the old BIGINT div-wrap point " +
    "(50k rows, 5 groups: per-group quotient ~2.5e19 > 2^63)") {
    import spark.implicits._
    val n = 50000
    val rows = (0 until n).map(i => (i.toLong % 997L, i.toLong, i % 5))
    val df = rows.toDF("v", "id", "grp")

    // BigInt brute replaying the engine's documented arithmetic:
    // double-ranks, per-group floored micro quotients, the two
    // closing truncating divisions.
    val sorted = rows.sortBy(r => (r._1, r._2))
    val rk = sorted.zipWithIndex.map { case (r, i) => (r, i + 1L) }
    val byV = rk.groupBy(_._1._1)
    val dr = byV.map { case (v, g) =>
      v -> (g.map(_._2).min + g.map(_._2).max) }
    val tie3 = byV.values.map { g =>
      val t = BigInt(g.size); t * t * t - t }.sum
    val byG = rows.groupBy(_._3)
    val q = byG.values.map { g =>
      val ng = BigInt(g.size)
      val r2g = g.map(r => BigInt(dr(r._1))).sum
      (r2g * r2g * 1000000) / ng // nonneg: / == floor == the engine
    }.sum
    val bn = BigInt(n)
    val hraw = (3 * q) / (bn * (bn + 1)) - 3 * (bn + 1) * 1000000
    val n3n = bn * bn * bn - bn
    val expected =
      if (n3n - tie3 <= 0) BigInt(0)
      else (hraw * n3n / (n3n - tie3)).max(BigInt(0))

    val r = Stats.kruskalWallis(df, "v", "grp", "id").head()
    assert(r.getAs[Long]("n") === n.toLong)
    assert(r.getAs[Long]("n_groups") === 5L)
    assert(BigInt(r.getAs[Long]("h_micro")) === expected,
      "h_micro diverged from the BigInt brute — the div wrap is back")
    // sanity: the old narrowed quotient really was past 2^63 here
    val maxQuot = byG.values.map { g =>
      val r2g = g.map(r => BigInt(dr(r._1))).sum
      (r2g * r2g * 1000000) / BigInt(g.size) }.max
    assert(maxQuot > BigInt(Long.MaxValue),
      "fixture no longer exercises the wrap regime — enlarge it")
  }

  // ------------------------------------------------------------------
  // 1b. etaSquared past the old wrap point (large-valued column).

  test("etaSquared is exact past the old BIGINT div-wrap point " +
    "(10k rows, values ~1e5: per-group quotient ~2e19 > 2^63)") {
    import spark.implicits._
    val n = 10000
    val rows = (0 until n).map(i => (100000L + (i % 7), s"s${i % 5}"))
    val df = rows.toDF("x", "grp")

    val byG = rows.groupBy(_._2)
    val a = byG.values.map { g =>
      val ng = BigInt(g.size)
      val sg = g.map(r => BigInt(r._1)).sum
      (sg * sg * 1000000) / ng
    }.sum
    val ss = rows.map(r => BigInt(r._1)).sum
    val sxx = rows.map(r => BigInt(r._1) * r._1).sum
    val bn = BigInt(n)
    val ssb = a - (ss * ss * 1000000) / bn
    val sst = sxx * 1000000 - (ss * ss * 1000000) / bn
    val expected =
      if (sst <= 0) BigInt(0)
      else ((ssb * 1000000) / sst).max(BigInt(0)).min(BigInt(1000000))

    val r = Stats.etaSquared(df, "x", "grp").head()
    assert(r.getAs[Long]("n") === n.toLong)
    assert(BigInt(r.getAs[Long]("eta2_ppm")) === expected,
      "eta2_ppm diverged from the BigInt brute — the div wrap is back")
    val maxQuot = byG.values.map { g =>
      val sg = g.map(r => BigInt(r._1)).sum
      (sg * sg * 1000000) / BigInt(g.size) }.max
    assert(maxQuot > BigInt(Long.MaxValue),
      "fixture no longer exercises the wrap regime — enlarge it")
  }

  // ------------------------------------------------------------------
  // 2. The high-cardinality (shuffle) regime of the rank join.

  test("mannWhitneyZ boundedValueDomain=false takes a shuffle join " +
    "(no BroadcastHashJoin under threshold=-1) and matches the " +
    "broadcast path digit for digit") {
    import spark.implicits._
    // near-continuous: every value distinct — the regime where the
    // per-value frame is corpus-sized and a broadcast would OOM
    val df = (0 until 4000)
      .map(i => (i * 37L + (i % 2), i.toLong, i % 2)).toDF("v", "id", "g")
    val expected = Stats.mannWhitneyZ(df, "v", "g", "id").head()
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val shuffled = Stats.mannWhitneyZ(df, "v", "g", "id",
        boundedValueDomain = false)
      val plan = shuffled.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"high-cardinality path still force-broadcasts:\n$plan")
      assert(shuffled.head() === expected)
    }
  }

  // ------------------------------------------------------------------
  // 3. Bounded-frame contracts are structural (loud), not scaladoc.

  test("series read-outs refuse an over-bound period count loudly " +
    "instead of detonating the O(m^2) pair frame") {
    import spark.implicits._
    val series = (0 until 50).map(i => (i.toLong, (i % 9).toLong))
      .toDF("t", "x")
    val eTs = intercept[IllegalArgumentException](
      Stats.theilSenSlope(series, "t", "x", maxPeriods = 10L))
    assert(eTs.getMessage.contains("theilSenSlope"))
    val eMk = intercept[IllegalArgumentException](
      Stats.mannKendall(series, "t", "x", maxPeriods = 10L))
    assert(eMk.getMessage.contains("mannKendall"))
    val eAc = intercept[IllegalArgumentException](
      Stats.autocorrelation(series, "t", "x", maxLag = 3,
        maxPeriods = 10L))
    assert(eAc.getMessage.contains("autocorrelation"))
    val eCu = intercept[IllegalArgumentException](
      Stats.cusumChangePoint(series, "t", "x", maxPeriods = 10L))
    assert(eCu.getMessage.contains("cusumChangePoint"))
    val cells = (0 until 20).map(i => (i.toLong, 10L, 5L))
      .toDF("bin", "n", "ok")
    val eIso = intercept[IllegalArgumentException](
      Stats.isotonicCalibration(cells, "bin", "n", "ok", maxBins = 4L))
    assert(eIso.getMessage.contains("isotonicCalibration"))
    // within bound: all five still answer
    assert(Stats.theilSenSlope(series, "t", "x").count() === 1L)
    assert(Stats.isotonicCalibration(cells, "bin", "n", "ok")
      .count() === 20L)
  }

  test("autocorrelation drops pairless lags (series shorter than " +
    "lag+1) — the per-lag GROUP BY reading both engines share") {
    import spark.implicits._
    val short = Seq((1L, 5L), (2L, 9L), (3L, 4L)).toDF("t", "x")
    val lags = Stats.autocorrelation(short, "t", "x", maxLag = 7)
      .select("lag").as[Long].collect().toSeq
    assert(lags === Seq(1L, 2L),
      s"expected only the lags with pairs, got $lags")
  }

  test("kruskalWallis boundedValueDomain=false takes a shuffle join " +
    "and matches the broadcast path digit for digit") {
    import spark.implicits._
    val df = (0 until 3000)
      .map(i => (i * 41L + (i % 3), i.toLong, s"g${i % 3}"))
      .toDF("v", "id", "grp")
    val expected = Stats.kruskalWallis(df, "v", "grp", "id").head()
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val shuffled = Stats.kruskalWallis(df, "v", "grp", "id",
        boundedValueDomain = false)
      val plan = shuffled.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"high-cardinality path still force-broadcasts:\n$plan")
      assert(shuffled.head() === expected)
    }
  }
}
