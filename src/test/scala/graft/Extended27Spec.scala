package graft

import org.apache.spark.sql.functions._

import graft.ext.Stats

/** Round-15 second batch: the [[graft.ext.Stats]] folds pinned against
  * BRUTE-FORCE reimplementations of the textbook definitions (pairwise
  * loops, explicit CDFs, explicit probe thresholds) — not against the
  * folds' own algebra — so a symmetric Spark+oracle mistake cannot
  * slip through the hash gate.
  */
class Extended27Spec extends SparkSpec {

  test("ksTwoSample == brute-force empirical-CDF max; label-swap " +
    "symmetric") {
    import spark.implicits._
    val g1 = Seq(1L, 3L, 3L, 7L, 9L, 9L, 12L)
    val g0 = Seq(2L, 3L, 5L, 5L, 11L)
    val df = (g1.map((_, 1)) ++ g0.map((_, 0))).toDF("v", "g")
    // brute: D·n1·n2 over all pooled values, straight from the CDFs
    val pooled = (g1 ++ g0).distinct.sorted
    val brute = pooled.map { v =>
      val a = g1.count(_ <= v).toLong
      val b = g0.count(_ <= v).toLong
      math.abs(a * g0.size - b * g1.size)
    }.max
    val r = Stats.ksTwoSample(df, "v", "g").head()
    assert(r.getAs[Long]("n1") === g1.size.toLong)
    assert(r.getAs[Long]("n2") === g0.size.toLong)
    assert(r.getAs[Long]("d_num") === brute)
    assert(r.getAs[Long]("ks_ppm") ===
      brute * 1000000L / (g1.size.toLong * g0.size))
    // swapping the labels swaps n1/n2 but leaves the distance alone
    val sw = Stats.ksTwoSample(
      df.select($"v", (lit(1) - $"g").as("g")), "v", "g").head()
    assert(sw.getAs[Long]("d_num") === brute)
    assert((sw.getAs[Long]("n1"), sw.getAs[Long]("n2")) ===
      ((g0.size.toLong, g1.size.toLong)))
  }

  test("mannWhitneyZ: 2U1 == brute pairwise count; z matches the " +
    "tie-corrected textbook formula") {
    import spark.implicits._
    val g1 = Seq(4L, 7L, 7L, 10L, 15L)
    val g0 = Seq(1L, 4L, 6L, 7L, 9L, 9L)
    val rows = (g1.map((_, 1)) ++ g0.map((_, 0))).zipWithIndex
      .map { case ((v, g), i) => (v, g, i.toLong) }
    val df = rows.toDF("v", "g", "id")
    // brute 2U1: every (g1, g0) pair contributes 2·[x>y] + [x==y]
    val u1x2 = (for (x <- g1; y <- g0)
      yield (if (x > y) 2L else if (x == y) 1L else 0L)).sum
    val n1 = g1.size.toLong; val n2 = g0.size.toLong; val n = n1 + n2
    // brute variance: textbook tie correction over pooled tie groups
    val tie3 = (g1 ++ g0).groupBy(identity).values
      .map(ts => { val t = ts.size.toLong; t * t * t - t }).sum
    val varU = n1.toDouble * n2 * ((n + 1).toDouble * n * (n - 1) - tie3) /
      (12.0 * n * (n - 1))
    val zPpm = math.floor(
      (u1x2 - n1 * n2).toDouble / (2.0 * math.sqrt(varU)) * 1e6 + 0.5).toLong
    val r = Stats.mannWhitneyZ(df, "v", "g").head()
    assert(r.getAs[Long]("n1") === n1)
    assert(r.getAs[Long]("n2") === n2)
    assert(r.getAs[Long]("u1_x2") === u1x2)
    assert(r.getAs[Long]("z_ppm") === zPpm)
    // Cliff's delta brute: (#(x>y) − #(x<y)) / (n1·n2), sign-symmetric
    val gt = (for (x <- g1; y <- g0) yield if (x > y) 1L else 0L).sum
    val ltc = (for (x <- g1; y <- g0) yield if (x < y) 1L else 0L).sum
    val num = gt - ltc
    val deltaPpm =
      if (num < 0) -(-num * 1000000L / (n1 * n2))
      else num * 1000000L / (n1 * n2)
    assert(r.getAs[Long]("cliffs_delta_ppm") === deltaPpm)
    // all-tied input: variance 0 -> z reads 0, loudly not NaN
    val flat = Seq((5L, 1, 1L), (5L, 0, 2L), (5L, 1, 3L), (5L, 0, 4L))
      .toDF("v", "g", "id")
    assert(Stats.mannWhitneyZ(flat, "v", "g").head()
      .getAs[Long]("z_ppm") === 0L)
  }

  test("cvmTwoSample == brute-force CDF-gap sum over pooled points") {
    import spark.implicits._
    val g1 = Seq(1L, 3L, 3L, 7L, 9L, 9L, 12L)
    val g0 = Seq(2L, 3L, 5L, 5L, 11L)
    val df = (g1.map((_, 1)) ++ g0.map((_, 0))).toDF("v", "g")
    val n1 = g1.size.toLong; val n2 = g0.size.toLong; val n = n1 + n2
    // brute: replay the documented per-value ppm floor literally
    val sq = (g1 ++ g0).distinct.map { v =>
      val a = g1.count(_ <= v).toLong
      val b = g0.count(_ <= v).toLong
      val t = (g1 ++ g0).count(_ == v).toLong
      val dppm = math.abs(a * n2 - b * n1) * 1000000L / (n1 * n2)
      t * dppm * dppm
    }.sum
    val expected = n1 * n2 * (sq / 1000000L) / (n * n)
    val r = Stats.cvmTwoSample(df, "v", "g").head()
    assert(r.getAs[Long]("n1") === n1)
    assert(r.getAs[Long]("t_micro") === expected)
    // sanity in absolute terms: brute double CvM agrees within 2 micro
    val tDouble = (g1 ++ g0).map { x =>
      val f1 = g1.count(_ <= x).toDouble / n1
      val f2 = g0.count(_ <= x).toDouble / n2
      (f1 - f2) * (f1 - f2)
    }.sum * n1 * n2 / (n.toDouble * n)
    assert(math.abs(expected - math.floor(tDouble * 1e6)) <= 2.0)
  }

  test("wasserstein1 == brute-force CDF-area integral; identical " +
    "distributions read 0; single-value corpus reads 0") {
    import spark.implicits._
    val g1 = Seq(1L, 3L, 3L, 7L, 9L, 9L, 12L)
    val g0 = Seq(2L, 3L, 5L, 5L, 11L)
    val df = (g1.map((_, 1)) ++ g0.map((_, 0))).toDF("v", "g")
    val n1 = g1.size.toLong; val n2 = g0.size.toLong
    val vs = (g1 ++ g0).distinct.sorted
    // brute: sum |F1-F2| * gap over adjacent distinct values
    val wNum = vs.init.zip(vs.tail).map { case (v, vn) =>
      val a = g1.count(_ <= v).toLong
      val b = g0.count(_ <= v).toLong
      math.abs(a * n2 - b * n1) * (vn - v)
    }.sum
    val r = Stats.wasserstein1(df, "v", "g").head()
    assert(r.getAs[Long]("n1") === n1)
    assert(r.getAs[Long]("w1_micro") === wNum * 1000000L / (n1 * n2))
    // same multiset in both groups -> every CDF gap is 0
    val same = (g0.map((_, 1)) ++ g0.map((_, 0))).toDF("v", "g")
    assert(Stats.wasserstein1(same, "v", "g").head()
      .getAs[Long]("w1_micro") === 0L)
    val single = Seq((5L, 1), (5L, 0), (5L, 0)).toDF("v", "g")
    val sr = Stats.wasserstein1(single, "v", "g").head()
    assert(sr.getAs[Long]("w1_micro") === 0L)
    assert((sr.getAs[Long]("n1"), sr.getAs[Long]("n2")) === ((1L, 2L)))
  }

  test("bhRandomizationTests: literal LCG simulation reproduces every " +
    "p; BH selection follows the step-up rule; undersized B is loud") {
    import spark.implicits._
    // 3 categories, one (cA) shifted far above the rest
    val rows = (0 until 36).map { i =>
      val cat = Seq("cA", "cB", "cC")(i % 3)
      val x = if (cat == "cA") 1000L + i else 10L + i
      (i.toLong, x, cat)
    }
    val df = rows.toDF("id", "x", "cat")
    val B = 400 // 401 >= m/alpha = 3/0.02 = 150
    val alphaPpm = 20000L
    val r = Stats.bhRandomizationTests(df, "x", "cat", "id", B, alphaPpm)
      .collect().map(x => x.getAs[String]("grp") -> x).toMap
    // literal simulation
    def u31(seed: Long): Long = {
      val x0 = seed % 2147483648L
      val x1 = (1103515245L * x0 + 12345L) % 2147483648L
      (1103515245L * x1 + 12345L) % 2147483648L
    }
    val n = rows.size.toLong
    val cats = rows.map(_._3).distinct.sorted
    val m = cats.size.toLong
    val ps = cats.zipWithIndex.map { case (c, gidx) =>
      val in = rows.filter(_._3 == c).map(_._2)
      val out = rows.filter(_._3 != c).map(_._2)
      val obs = math.abs(in.sum * 1000000000L / in.size -
        out.sum * 1000000000L / out.size)
      val thr = in.size.toLong * 2147483648L / n
      val bGe = (0 until B).count { b =>
        val (a, o) = rows.partition(row =>
          u31((row._1 * m + gidx) * B + b) < thr)
        if (a.isEmpty || o.isEmpty) true
        else math.abs(a.map(_._2).sum * 1000000000L / a.size -
          o.map(_._2).sum * 1000000000L / o.size) >= obs
      }
      c -> ((1L + bGe) * 1000000L / (B + 1))
    }.toMap
    for (c <- cats) {
      assert(r(c).getAs[Long]("p_ppm") === ps(c), s"cat $c")
      assert(r(c).getAs[Long]("n_g") === rows.count(_._3 == c).toLong)
    }
    // BH step-up replayed from the simulated p's
    val sorted = cats.sortBy(c => (ps(c), c)).zipWithIndex
      .map { case (c, i) => (c, i + 1L) }
    val kstar = sorted.filter { case (c, k) => ps(c) * m <= alphaPpm * k }
      .map(_._2).maxOption.getOrElse(0L)
    for ((c, k) <- sorted) {
      assert(r(c).getAs[Long]("bh_k") === k)
      assert(r(c).getAs[Long]("bh_reject") === (if (k <= kstar) 1L else 0L))
    }
    // the shifted category must be the (only) rejection here
    assert(r("cA").getAs[Long]("bh_reject") === 1L)
    val e = intercept[IllegalArgumentException] {
      Stats.bhRandomizationTests(df, "x", "cat", "id", 16, alphaPpm)
    }
    assert(e.getMessage.contains("cannot resolve"))
  }

  test("chiSquareHomogeneity: hand 2x2 pin; homogeneous table reads 0; " +
    "NULL bin is loud") {
    import spark.implicits._
    // O = [[10,20],[20,10]]: chi2 = 20/3, V = sqrt(chi2/n) = 1/3
    val rows =
      Seq.fill(10)(("b0", "gA")) ++ Seq.fill(20)(("b0", "gB")) ++
        Seq.fill(20)(("b1", "gA")) ++ Seq.fill(10)(("b1", "gB"))
    val r = Stats.chiSquareHomogeneity(rows.toDF("bin", "grp"), "bin", "grp")
      .head()
    assert(r.getAs[Long]("n") === 60L)
    assert(r.getAs[Long]("dof") === 1L)
    assert(r.getAs[Long]("chi2_micro") === 6666664L) // 6.6667 − 2 micro trunc
    assert(r.getAs[Long]("cramers_v_ppm") === 333333L)
    // perfectly homogeneous: chi2 clamps to >= 0 despite truncation
    val homo = Seq.fill(6)(("b0", "gA")) ++ Seq.fill(6)(("b0", "gB")) ++
      Seq.fill(3)(("b1", "gA")) ++ Seq.fill(3)(("b1", "gB"))
    val h = Stats.chiSquareHomogeneity(homo.toDF("bin", "grp"), "bin", "grp")
      .head()
    assert(h.getAs[Long]("chi2_micro") === 0L)
    assert(h.getAs[Long]("cramers_v_ppm") === 0L)
    val holey = Seq((Some("b0"), "gA"), (None: Option[String], "gB"))
      .toDF("bin", "grp")
    val e = intercept[Exception] {
      Stats.chiSquareHomogeneity(holey, "bin", "grp").collect()
    }
    assert(e.getMessage.contains("chiSquareHomogeneity: NULL"))
  }

  test("permutationMeanDiff: deterministic replay matches a literal " +
    "Scala LCG simulation; empty group is loud") {
    import spark.implicits._
    val rows = (0 until 40).map { i =>
      (i.toLong, (if (i % 3 == 0) 100L + i else 10L + i),
        if (i % 3 == 0) 1 else 0)
    }
    val df = rows.toDF("id", "x", "g")
    val B = 8
    // literal simulation of the shared LCG coin + nano-floored means
    def bit(seed: Long): Int = {
      val x0 = seed % 2147483648L
      val x1 = (1103515245L * x0 + 12345L) % 2147483648L
      val x2 = (1103515245L * x1 + 12345L) % 2147483648L
      if (x2 % 2097152L >= 1048576L) 1 else 0
    }
    def meanDiff(split: Seq[(Long, Int)]): Option[Long] = {
      val a = split.filter(_._2 == 1).map(_._1)
      val b = split.filter(_._2 == 0).map(_._1)
      if (a.isEmpty || b.isEmpty) None
      else Some(math.abs(a.sum * 1000000000L / a.size -
        b.sum * 1000000000L / b.size))
    }
    val obs = meanDiff(rows.map(r => (r._2, r._3))).get
    val bGe = (0 until B).count { b =>
      meanDiff(rows.map(r => (r._2, bit(r._1 * B + b))))
        .forall(_ >= obs) // empty side counts as extreme
    }.toLong
    val r = Stats.permutationMeanDiff(df, "x", "g", "id", B).head()
    assert(r.getAs[Long]("n") === 40L)
    assert(r.getAs[Long]("b_reps") === B.toLong)
    assert(r.getAs[Long]("obs_diff_nano") === obs)
    assert(r.getAs[Long]("b_ge") === bGe)
    assert(r.getAs[Long]("p_ppm") === (1 + bGe) * 1000000L / (B + 1))
    val oneSided = Seq((1L, 5L, 1), (2L, 6L, 1)).toDF("id", "x", "g")
    val e = intercept[Exception] {
      Stats.permutationMeanDiff(oneSided, "x", "g", "id", 4).collect()
    }
    assert(e.getMessage.contains("permutationMeanDiff: a group is empty"))
  }

  test("systematicResample == brute probe-threshold counting; " +
    "multiplicities always sum to m") {
    import spark.implicits._
    val ws = Seq(5L, 1L, 1L, 1L, 2L) // hand case from the derivation
    for ((weights, m) <- Seq((ws, 4), (Seq(3L, 9L, 1L, 14L, 2L, 2L), 7),
      (Seq(1L), 5))) {
      val df = weights.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "w")
      val got = Stats.systematicResample(df, "id", "w", m)
        .orderBy($"id").collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("mult")).toMap
      // brute: materialize the m probe thresholds, count per interval
      val W = weights.sum
      val ts = (0 until m).map(j => (2L * j + 1) * W / (2L * m))
      val cum = weights.scanLeft(0L)(_ + _)
      val brute = weights.indices.map { i =>
        i.toLong -> ts.count(t => t >= cum(i) && t < cum(i + 1)).toLong
      }.toMap
      assert(got === brute, s"weights=$weights m=$m")
      assert(got.values.sum === m.toLong)
    }
    import spark.implicits._
    val bad = Seq((1L, 0L)).toDF("id", "w")
    val e = intercept[Exception] {
      Stats.systematicResample(bad, "id", "w", 3).collect()
    }
    assert(e.getMessage.contains("systematicResample: weights must be > 0"))
  }

  test("kendallTauB == brute pairwise concordance over exploded rows") {
    import spark.implicits._
    val pts = Seq((1, 1), (1, 2), (2, 1), (2, 2), (2, 2), (3, 1),
      (3, 3), (4, 2), (4, 4), (4, 4))
    val cells = pts.groupBy(identity).toSeq
      .map { case ((x, y), g) => (x, y, g.size.toLong) }
      .toDF("dx", "dy", "o")
    var cP = 0L; var dP = 0L
    for (i <- pts.indices; j <- pts.indices if i < j) {
      val ((x1, y1), (x2, y2)) = (pts(i), pts(j))
      if ((x1 < x2 && y1 < y2) || (x1 > x2 && y1 > y2)) cP += 1
      else if ((x1 < x2 && y1 > y2) || (x1 > x2 && y1 < y2)) dP += 1
    }
    val n = pts.size.toLong
    val t1 = pts.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1))
      .sum
    val t2 = pts.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1))
      .sum
    val taub = math.floor(2.0 * (cP - dP) /
      math.sqrt((n * (n - 1) - t1).toDouble * (n * (n - 1) - t2)) * 1e6 +
      0.5).toLong
    val r = Stats.kendallTauB(cells, "dx", "dy", "o").head()
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("c_pairs") === cP)
    assert(r.getAs[Long]("d_pairs") === dP)
    assert(r.getAs[Long]("taub_ppm") === taub)
  }

  test("Drift.ksBinned == brute per-group binned CDF loop; " +
    "whole-corpus group reads 0") {
    import spark.implicits._
    val rows = (0 until 60).map { i =>
      val g = "xyz"((i % 7) % 3).toString
      val bin = (i * 11 + (if (g == "z") 5 else 0)) % 10
      (g, bin)
    }
    val df = rows.toDF("src", "bin")
    val groups = rows.map(_._1).distinct.sorted
    val n = rows.size.toLong
    val brute = groups.map { g =>
      val ng = rows.count(_._1 == g).toLong
      val d = (0 until 10).map { b =>
        val cg = rows.count(r => r._1 == g && r._2 <= b).toLong
        val cr = rows.count(r => r._1 != g && r._2 <= b).toLong
        math.abs(cg * (n - ng) - cr * ng)
      }.max
      g -> (d * 1000000L / (ng * (n - ng)))
    }.toMap
    val got = graft.ext.Drift.ksBinned(df, "src", "bin")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("ks_ppm")).toMap
    assert(got === brute)
    val solo = Seq(("only", 1), ("only", 2)).toDF("src", "bin")
    assert(graft.ext.Drift.ksBinned(solo, "src", "bin").head()
      .getAs[Long]("ks_ppm") === 0L)
  }

  test("Drift.psiBinned == brute Laplace-smoothed PSI loop; an " +
    "isolated group dominates") {
    import spark.implicits._
    val rows = (0 until 90).map { i =>
      val g = "pqr"(i % 3).toString
      val bin = g match {
        case "p" => (i / 3) % 6       // bins 0..5
        case "q" => 1 + (i / 3) % 6   // bins 1..6 — broad overlap with p
        case _ => 8 + (i / 3) % 2     // bins nobody else touches
      }
      (g, bin)
    }
    val df = rows.toDF("src", "bin")
    val groups = rows.map(_._1).distinct.sorted
    val bins = rows.map(_._2).distinct
    val bCnt = bins.size.toLong
    val n = rows.size.toLong
    val brute = groups.map { g =>
      val ng = rows.count(_._1 == g).toLong
      val t = bins.map { b => // every bin PRESENT anywhere, zero-filled
        val ngb = rows.count(r => r._1 == g && r._2 == b).toLong
        val nb = rows.count(_._2 == b).toLong
        val p = (ngb + 1).toDouble / (ng + bCnt)
        val q = (nb - ngb + 1).toDouble / (n - ng + bCnt)
        math.floor((p - q) * math.log(p / q) * 1e9 + 0.5).toLong
      }.sum
      g -> t
    }.toMap
    val got = graft.ext.Drift.psiBinned(df, "src", "bin")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("psi_nano"))
      .toMap
    assert(got === brute)
    assert(got("r") > got("p") && got("r") > got("q"))
  }

  test("isotonicCalibration == brute pool-adjacent-violators loop; " +
    "fit is monotone; already-monotone input is untouched") {
    import spark.implicits._
    // classic PAV pooling, independent of the max-min closed form
    def brutePav(cells: Seq[(Long, Long, Long)]): Seq[Long] = {
      case class Block(n: Long, ok: Long, size: Int)
      val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
      for ((_, n, ok) <- cells.sortBy(_._1)) {
        stack += Block(n, ok, 1)
        // pool while the last block's avg < the previous block's avg
        while (stack.size >= 2 && {
          val a = stack(stack.size - 2); val b = stack.last
          // exact rational comparison: okB/nB < okA/nA
          b.ok * a.n < a.ok * b.n
        }) {
          val b = stack.remove(stack.size - 1)
          val a = stack.remove(stack.size - 1)
          stack += Block(a.n + b.n, a.ok + b.ok, a.size + b.size)
        }
      }
      stack.toSeq.flatMap(bl =>
        Seq.fill(bl.size)(bl.ok * 1000000L / bl.n))
    }
    val cells = Seq((0L, 10L, 2L), (1L, 10L, 6L), (2L, 10L, 4L),
      (3L, 10L, 5L), (4L, 10L, 9L), (5L, 10L, 8L))
    val got = graft.ext.Stats.isotonicCalibration(
        cells.toDF("bin", "n", "correct"), "bin", "n", "correct")
      .orderBy($"bin").collect().map(_.getAs[Long]("fitted_micro")).toSeq
    assert(got === brutePav(cells))
    assert(got === got.sorted, "fit must be monotone non-decreasing")
    // monotone input: the fit IS the raw accuracy
    val mono = Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 9L))
    val gotMono = graft.ext.Stats.isotonicCalibration(
        mono.toDF("bin", "n", "correct"), "bin", "n", "correct")
      .orderBy($"bin").collect()
      .map(r => (r.getAs[Long]("acc_micro"), r.getAs[Long]("fitted_micro")))
    gotMono.foreach { case (acc, fit) => assert(acc === fit) }
  }

  test("rougeBleuPairs == brute multiset overlap + literal BLEU math; " +
    "identical pair reads 1e6 across the board") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a"), (2L, "a c d"), (3L, "a b c a"),
      (4L, "x"), (5L, "a c d d")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L), (5L, 2L))
      .toDF("id_a", "id_b")
    def grams(t: String, n: Int): Seq[String] = {
      val tk = t.split("\\s+").toSeq
      if (n == 1) tk
      else if (tk.size < 2) tk // the q55 padding convention
      else tk.sliding(2).map(_.mkString(" ")).toSeq
    }
    def ov(a: String, b: String, n: Int): Long = {
      val ca = grams(a, n).groupBy(identity).view.mapValues(_.size)
      val cb = grams(b, n).groupBy(identity).view.mapValues(_.size)
      ca.keys.toSeq.intersect(cb.keys.toSeq)
        .map(g => math.min(ca(g), cb(g)).toLong).sum
    }
    val byText = Seq((1L, "a b c a"), (2L, "a c d"), (3L, "a b c a"),
      (4L, "x"), (5L, "a c d d")).toMap
    val brute = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L), (5L, 2L))
      .map { case (ia, ib) =>
        val (a, b) = (byText(ia), byText(ib))
        val (o1, o2) = (ov(a, b, 1), ov(a, b, 2))
        val (l1a, l1b) = (grams(a, 1).size.toLong, grams(b, 1).size.toLong)
        val (l2a, l2b) = (grams(a, 2).size.toLong, grams(b, 2).size.toLong)
        val bleu = if (o1 == 0 || o2 == 0) 0L else {
          val bp = if (l1b >= l1a) 1.0
            else math.exp(1.0 - l1a.toDouble / l1b)
          math.floor(bp * math.sqrt((o1.toDouble / l1b) *
            (o2.toDouble / l2b)) * 1e6 + 0.5).toLong
        }
        (ia, ib) -> ((2 * o1 * 1000000L / (l1a + l1b),
          2 * o2 * 1000000L / (l2a + l2b), bleu))
      }.toMap
    val got = graft.ext.TextEval.rougeBleuPairs(docs, pairs, "doc_id",
      "text").collect()
      .map(r => (r.getAs[Long]("ia"), r.getAs[Long]("ib")) ->
        ((r.getAs[Long]("rouge1_f_ppm"), r.getAs[Long]("rouge2_f_ppm"),
          r.getAs[Long]("bleu2_ppm")))).toMap
    assert(got === brute)
    assert(got((1L, 3L)) === ((1000000L, 1000000L, 1000000L)))
    // the asymmetric brevity penalty: (2,5) unpenalized, (5,2) penalized
    assert(got((2L, 5L))._3 === 707107L)
    assert(got((5L, 2L))._3 === 716531L)
  }

  test("coverageCurve: hand histogram pins; k past the vocabulary " +
    "clamps to full coverage") {
    import spark.implicits._
    val counts = Seq(("a", 5L), ("b", 3L), ("c", 3L), ("d", 1L))
      .toDF("tok", "cnt")
    val rows = Stats.coverageCurve(counts, "tok", "cnt",
      Seq(1L, 2L, 3L, 10L)).collect()
      .map(r => (r.getAs[Long]("k"),
        (r.getAs[Long]("types_used"), r.getAs[Long]("coverage_ppm"))))
      .toMap
    assert(rows(1L) === ((1L, 416666L)))  // 5/12
    assert(rows(2L) === ((2L, 666666L)))  // (5+3)/12, tie 'b' before 'c'
    assert(rows(3L) === ((3L, 916666L)))  // 11/12
    assert(rows(10L) === ((4L, 1000000L)))
  }
}
