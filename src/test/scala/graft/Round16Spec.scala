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
  * 2. mannWhitneyZ / kruskalWallis no longer join the per-value rank
  *    frame back onto the corpus AT ALL: the double rank is a pure
  *    function of the value histogram's prefix sums
  *    (dr = 2·C(<v) + t + 1), so the r15 broadcast-OOM /
  *    hot-value-shuffle dilemma is structurally gone. Pinned here on
  *    a high-cardinality (every value distinct) fixture: MWU's plan
  *    carries no join of any kind, and the FromCounts forms read the
  *    identical row from pre-folded cells.
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

    val r = Stats.kruskalWallis(df, "v", "grp").head()
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
  // 2. The rank device never returns to the corpus.

  test("mannWhitneyZ is join-free (the histogram fold IS the whole " +
    "plan) and the FromCounts form reads the identical row from " +
    "pre-folded cells — high-cardinality fixture") {
    import spark.implicits._
    // near-continuous: every value distinct — the regime where the
    // old per-value broadcast was corpus-sized
    val df = (0 until 4000)
      .map(i => (i * 37L + (i % 2), i % 2)).toDF("v", "g")
    val direct = Stats.mannWhitneyZ(df, "v", "g")
    val plan = direct.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"MWU must not join anything back onto the corpus:\n$plan")
    val expected = direct.head()
    val cells = df.groupBy($"v", $"g").agg(count(lit(1)).as("n"))
    assert(Stats.mannWhitneyZFromCounts(cells, "v", "g", "n").head()
      === expected)
  }

  test("spearmanRho == BigInt double-rank brute (ties on both axes); " +
    "FromCounts reads the identical row") {
    import spark.implicits._
    val rows = (0 until 200).map(i =>
      ((i % 13).toLong, ((i * 7) % 11).toLong))
    val df = rows.toDF("x", "y")
    def drMap(vs: Seq[Long]): Map[Long, BigInt] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val first = sorted.indexOf(v) + 1L
        val last = sorted.lastIndexOf(v) + 1L
        v -> BigInt(first + last)
      }.toMap
    }
    val dx = drMap(rows.map(_._1)); val dy = drMap(rows.map(_._2))
    val n = BigInt(rows.size)
    val sx = rows.map(r => dx(r._1)).sum
    val sy = rows.map(r => dy(r._2)).sum
    val sxx = rows.map(r => dx(r._1) * dx(r._1)).sum
    val syy = rows.map(r => dy(r._2) * dy(r._2)).sum
    val sxy = rows.map(r => dx(r._1) * dy(r._2)).sum
    val num = n * sxy - sx * sy
    val radx = n * sxx - sx * sx; val rady = n * syy - sy * sy
    val expected =
      if (radx == 0 || rady == 0) 0L
      else math.floor(num.toDouble /
        (math.sqrt(radx.toDouble) * math.sqrt(rady.toDouble))
        * 1000000.0 + 0.5).toLong
    val r = Stats.spearmanRho(df, "x", "y").head()
    assert(r.getAs[Long]("n") === rows.size.toLong)
    assert(r.getAs[Long]("spearman_ppm") === expected)
    val cells = df.groupBy($"x", $"y").agg(count(lit(1)).as("n"))
    assert(Stats.spearmanRhoFromCounts(cells, "x", "y", "n").head()
      === r)
  }

  test("winnowFingerprints == brute sliding-window argmin; the MOSS " +
    "guarantee holds (shared run >= w+k-1 tokens => shared " +
    "fingerprint); short docs emit nothing") {
    import spark.implicits._
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two three $run four five six"),
      (2L, s"$run nine ten eleven twelve thirteen fourteen"),
      (3L, "totally different words everywhere here friend okay yes"),
      (4L, "tiny doc only")).toDF("doc_id", "text")
    val k = 4; val w = 5
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def brute(text: String): Set[String] = {
      val t = text.trim.split("\\s+")
      if (t.length < k + w - 1) return Set.empty
      val hs = (0 to t.length - k)
        .map(i => md5hex(t.slice(i, i + k).mkString(" ")))
      (0 to hs.length - w).map { q =>
        (q until q + w).map(p => (hs(p), p)).min._1
      }.toSet
    }
    val got = graft.ext.TextDedup
      .winnowFingerprints(docs, "doc_id", "text", k, w)
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    for ((id, text) <- rows) {
      assert(got.getOrElse(id, Set.empty) === brute(text),
        s"doc $id fingerprint set diverged from brute winnowing")
    }
    // guarantee: docs 1 and 2 share the 8-token run => >= 1 shared
    assert((got(1L) intersect got(2L)).nonEmpty)
    // disjoint text shares nothing; sub-window doc emits nothing
    assert((got(1L) intersect got.getOrElse(3L, Set.empty)).isEmpty)
    assert(!got.contains(4L))
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

  // ------------------------------------------------------------------
  // 4. New sequential change detectors vs literal brute force.

  test("pettittChangePoint == brute double-loop U_t (incl. ties); " +
    "a planted level shift is found at the shift; p_ppm mirrors the " +
    "textbook approximation") {
    import spark.implicits._
    // noisy series with ties and a level shift at t = 20
    val xs = (0 until 32).map(i =>
      (i.toLong, (i % 5).toLong + (if (i >= 20) 40L else 0L)))
    val df = xs.toDF("t", "x")
    val m = xs.size
    // brute: U_t = sum_{i<=t} sum_{j>t} sign(x_i - x_j), t in [1, m)
    val us = (1 until m).map { tp =>
      val (a, b) = xs.map(_._2).splitAt(tp)
      tp.toLong -> a.map(xi => b.map(xj =>
        java.lang.Long.signum(xi - xj).toLong).sum).sum
    }
    val (bt, bu) = us.minBy { case (tp, u) => (-math.abs(u), tp) }
    val k = math.abs(bu)
    val pExp = math.min(1000000L, math.floor(2.0 *
      math.exp(-6.0 * k.toDouble * k /
        (m.toDouble * m * m + m.toDouble * m)) * 1000000.0 + 0.5)
      .toLong)
    val r = Stats.pettittChangePoint(df, "t", "x").head()
    assert(r.getAs[Long]("n_periods") === m.toLong)
    assert(r.getAs[Long]("change_t") === bt - 1L,
      "change_t must be the LAST period of the pre-shift segment")
    assert(r.getAs[Long]("k_stat") === k)
    assert(r.getAs[Long]("p_ppm") === pExp)
    // the split lands at the shift boundary (|U| ties between the
    // last two pre-shift periods resolve earliest)
    assert(r.getAs[Long]("change_t") >= 18L &&
      r.getAs[Long]("change_t") <= 19L,
      s"split ${r.getAs[Long]("change_t")} is off the planted boundary")
    // m < 2: no interior split point — empty read-out
    assert(Stats.pettittChangePoint(
      Seq((1L, 5L)).toDF("t", "x"), "t", "x").count() === 0L)
  }

  test("pageHinkleyDrawup == brute centered-cumsum drawup; a dip-" +
    "then-rise series peaks at the rise, earliest tie wins") {
    import spark.implicits._
    val xs = (0 until 24).map(i =>
      (i.toLong, if (i < 8) 10L else if (i < 16) 2L else 30L))
    val df = xs.toDF("t", "x")
    val n = BigInt(xs.size)
    val sx = xs.map(x => BigInt(x._2)).sum
    val ds = xs.map(x => n * x._2 - sx)
    val cs = ds.scanLeft(BigInt(0))(_ + _).tail
    val dups = cs.zipWithIndex.map { case (c, i) =>
      (xs(i)._1, c - cs.take(i + 1).min) }
    val (bt, bd) = dups.minBy { case (tp, d) => (-d, tp) }
    val expPpm = (bd * 1000000) / (n * sx)
    val r = Stats.pageHinkleyDrawup(df, "t", "x").head()
    assert(r.getAs[Long]("n_periods") === xs.size.toLong)
    assert(r.getAs[Long]("peak_t") === bt)
    assert(BigInt(r.getAs[Long]("ph_ppm")) === expPpm)
    assert(r.getAs[Long]("peak_t") === 23L,
      "the drawup must peak at the end of the planted rise")
    // guard is loud
    val e = intercept[IllegalArgumentException](
      Stats.pageHinkleyDrawup(df, "t", "x", maxPeriods = 5L))
    assert(e.getMessage.contains("pageHinkleyDrawup"))
    // duplicate period keys refuse loudly in BOTH sequential
    // detectors (a tied t would make the time rank nondeterministic)
    val dup = Seq((1L, 5L), (1L, 9L), (2L, 3L)).toDF("t", "x")
    val eDup = intercept[IllegalArgumentException](
      Stats.pettittChangePoint(dup, "t", "x"))
    assert(eDup.getMessage.contains("distinct periods"))
    val eDup2 = intercept[IllegalArgumentException](
      Stats.pageHinkleyDrawup(dup, "t", "x"))
    assert(eDup2.getMessage.contains("distinct periods"))
  }

  test("madOutliers == brute lower-median/MAD fence; the planted " +
    "burst day is the ONLY outlier (a mean/stddev fence would dilute)") {
    import spark.implicits._
    val xs = (0 until 31).map(i =>
      (i.toLong, if (i == 17) 5000L else 40L + (i % 9)))
    val df = xs.toDF("t", "x")
    val vals = xs.map(_._2)
    def lowerMedian(vs: Seq[Long]): Long =
      vs.sorted.apply(((vs.size + 1) / 2 - 1).toInt)
    val med = lowerMedian(vals)
    val devs = vals.map(v => math.abs(v - med))
    val mad = lowerMedian(devs)
    val nOut = devs.count(_ > mad * 5L)
    val r = Stats.madOutliers(df, "t", "x").head()
    assert(r.getAs[Long]("n_periods") === 31L)
    assert(r.getAs[Long]("med") === med)
    assert(r.getAs[Long]("mad") === mad)
    assert(r.getAs[Long]("n_outliers") === nOut.toLong)
    assert(nOut === 1, "fixture must plant exactly one burst outlier")
    // constant series: MAD 0, zero outliers (nothing deviates)
    val flat = (0 until 9).map(i => (i.toLong, 7L)).toDF("t", "x")
    val rf = Stats.madOutliers(flat, "t", "x").head()
    assert(rf.getAs[Long]("mad") === 0L)
    assert(rf.getAs[Long]("n_outliers") === 0L)
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

  test("kruskalWallis touches the corpus once (cell fold); its one " +
    "join is histogram x cells; FromCounts reads the identical row " +
    "— high-cardinality fixture") {
    import spark.implicits._
    val df = (0 until 3000)
      .map(i => (i * 41L + (i % 3), s"g${i % 3}"))
      .toDF("v", "grp")
    val direct = Stats.kruskalWallis(df, "v", "grp")
    val expected = direct.head()
    val cells = df.groupBy($"v", $"grp").agg(count(lit(1)).as("n"))
    assert(Stats.kruskalWallisFromCounts(cells, "v", "grp", "n").head()
      === expected)
    // sanity vs the old shape: a 3-group high-cardinality corpus
    // still answers without any forced broadcast of a corpus-sized
    // frame (the fold is cells -> histogram -> bounded join)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      assert(Stats.kruskalWallis(df, "v", "grp").head() === expected)
    }
  }
}
