package graft

import org.apache.spark.sql.functions._

/** Round-15 sixth batch: block power iteration (top-k subspace),
  * subspace variance share, quantile normalization. */
class Extended28Spec extends SparkSpec {

  private def mkEmb(rows: Seq[Array[Float]]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
  }

  // two dominant orthogonal axes (e1 strong, e2 weaker) + trace noise
  private def twoAxisCorpus(dim: Int, n: Int): Seq[Array[Float]] =
    (0 until n).map { i =>
      val a = if (i % 2 == 0) 10f else -10f // axis e1, variance 100
      val b = if (i % 4 < 2) 3f else -3f    // axis e2, variance 9
      Array.tabulate(dim)(j =>
        (if (j == 0) a else if (j == 1) b else 0.001f * ((i + j) % 3)))
    }

  test("topSubspace k=1 reproduces topComponent bit for bit") {
    val emb = mkEmb(twoAxisCorpus(8, 40))
    val (mu1, v1, _) = graft.ext.Spectral
      .topComponentWithResiduals(emb, "embedding", iterations = 5)
    val (mu2, vs, _) = graft.ext.Spectral
      .topSubspace(emb, "embedding", k = 1, iterations = 5)
    assert(mu1.toSeq === mu2.toSeq)
    assert(v1.toSeq === vs.head.toSeq)
  }

  test("topSubspace k=2: finds both planted axes, orthonormal output, " +
    "Rayleigh orders the spectrum") {
    val emb = mkEmb(twoAxisCorpus(8, 40))
    val (_, vs, ray) = graft.ext.Spectral
      .topSubspace(emb, "embedding", k = 2, iterations = 8)
    val (va, vb) = (vs(0), vs(1))
    assert(math.abs(va(0)) > 0.999, s"pc1 should be ±e1: ${va.toSeq}")
    assert(math.abs(vb(1)) > 0.999, s"pc2 should be ±e2: ${vb.toSeq}")
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(math.abs(dot(va, vb)) < 1e-6)
    assert(math.abs(dot(va, va) - 1.0) < 1e-6)
    assert(math.abs(dot(vb, vb) - 1.0) < 1e-6)
    // final-iteration Rayleigh quotients: leading direction dominates
    val last = ray.filter(_._1 == 8).map(r => r._2 -> r._3).toMap
    assert(last(1) > last(2) && last(2) > 0.0)
  }

  test("topSubspace: loud on non-power-of-two-divisible dim and on " +
    "rank-deficient corpora") {
    val emb = mkEmb(twoAxisCorpus(7, 12)) // k=2 needs 2^(k-1)=2 | dim
    val e = intercept[IllegalArgumentException] {
      graft.ext.Spectral.topSubspace(emb, "embedding", 2, 2)
    }
    assert(e.getMessage.contains("Rademacher starts"))
    // k=2 on dim 6 is legal under the exact condition (2 | 6); and
    // k=1 carries NO dim constraint (topComponent's domain)
    graft.ext.Spectral.topSubspace(mkEmb(twoAxisCorpus(6, 12)),
      "embedding", 2, 2)
    graft.ext.Spectral.topSubspace(mkEmb(twoAxisCorpus(7, 12)),
      "embedding", 1, 2)
    // all rows identical: zero variance in every direction
    val flat = mkEmb(Seq.fill(10)(Array.fill(8)(2f)))
    val e2 = intercept[IllegalArgumentException] {
      graft.ext.Spectral.topSubspace(flat, "embedding", 2, 2)
    }
    assert(e2.getMessage.contains("collapsed"))
  }

  test("subspaceShare: k=1 equals topShare exactly; the planted " +
    "2-axis corpus is ~fully captured by its two axes") {
    val emb = mkEmb(twoAxisCorpus(8, 40))
    val (mu, vs, _) = graft.ext.Spectral
      .topSubspace(emb, "embedding", k = 2, iterations = 8)
    val single = graft.ext.Spectral
      .topShare(emb, "embedding", mu, vs.head).head()
    val sub1 = graft.ext.Spectral
      .subspaceShare(emb, "embedding", mu, Seq(vs.head)).head()
    assert(single.toSeq === sub1.toSeq)
    val sub2 = graft.ext.Spectral
      .subspaceShare(emb, "embedding", mu, vs).head()
    assert(sub2.getAs[Long]("share_ppm") > 999900L,
      s"two axes must capture ~everything: ${sub2.toSeq}")
    assert(sub2.getAs[Long]("share_ppm") >
      single.getAs[Long]("share_ppm"))
  }

  test("removeSubspace: k=1 equals removeTop bit for bit; Parseval " +
    "identity share + residual ≈ 1e6; planted corpus leaves only noise") {
    import spark.implicits._
    val emb = mkEmb(twoAxisCorpus(8, 40))
    val (mu, vs, _) = graft.ext.Spectral
      .topSubspace(emb, "embedding", k = 2, iterations = 8)
    val viaTop = graft.ext.Spectral
      .removeTop(emb, "embedding", mu, vs.head, "r")
      .orderBy($"vec_id").collect().map(_.getSeq[Float](2).toSeq).toSeq
    val viaSub = graft.ext.Spectral
      .removeSubspace(emb, "embedding", mu, Seq(vs.head), "r")
      .orderBy($"vec_id").collect().map(_.getSeq[Float](2).toSeq).toSeq
    assert(viaTop === viaSub)
    // Parseval: captured share + residual share ≈ 1 (float + floor slack)
    val share = graft.ext.Spectral
      .subspaceShare(emb, "embedding", mu, vs).head()
      .getAs[Long]("share_ppm")
    val removed = graft.ext.Spectral
      .removeSubspace(emb, "embedding", mu, vs, "r")
    val resid = removed.select(
        floor(graft.ext.Spectral.centeredEnergyCol($"embedding", mu)
          * 1000000.0 + 0.5).cast("long").as("d2m"),
        floor(graft.ext.Spectral.centeredEnergyCol($"r", mu)
          * 1000000.0 + 0.5).cast("long").as("r2m"))
      .agg(sum($"d2m").as("t"), sum($"r2m").as("rr")).head()
    val residPpm = resid.getAs[Long]("rr") * 1000000L /
      resid.getAs[Long]("t")
    assert(math.abs(share + residPpm - 1000000L) < 200L,
      s"share=$share resid=$residPpm")
    // the two planted axes carry ~everything: the residual is noise
    assert(residPpm < 100L, s"resid=$residPpm")
  }

  test("Expectations.report: dirty fixture counts every violation " +
    "class; an unevaluable (NULL) predicate counts as violated") {
    import spark.implicits._
    val dirty = Seq(
      (Some(1L), Some("ok text"), Some(7L)),
      (None: Option[Long], Some("x"), Some(1L)), // null id
      (Some(3L), None: Option[String], None: Option[Long]), // null text
      (Some(4L), Some(""), Some(0L)), // empty text
      (Some(5L), Some("abc"), Some(99L)) // wrong n_chars
    ).toDF("id", "text", "n_chars")
    val rows = graft.ext.Expectations.report(Seq(
      ("t", dirty, Seq(
        "id_null" -> $"id".isNull,
        "text_empty" -> ($"text".isNull || length(trim($"text")) === 0),
        "n_chars_mismatch" -> !($"n_chars" <=> length($"text")),
        "n_chars_positive_violated" -> ($"n_chars" <= 0)))))
      .collect()
      .map(r => r.getAs[String]("check") ->
        ((r.getAs[Long]("n_checked"), r.getAs[Long]("n_violations"),
          r.getAs[Long]("pass")))).toMap
    assert(rows("t.id_null") === ((5L, 1L, 0L)))
    assert(rows("t.text_empty") === ((5L, 2L, 0L)))
    // only row 5 mismatches; row 3's BOTH-null pair is <=>-equal by
    // design (mirrors the oracle's IS DISTINCT FROM)
    assert(rows("t.n_chars_mismatch") === ((5L, 1L, 0L)))
    // row 4 violates (0); row 3's NULL predicate counts as violated
    assert(rows("t.n_chars_positive_violated") === ((5L, 2L, 0L)))
    val clean = Seq((1L, "ab", 2L)).toDF("id", "text", "n_chars")
    val ok = graft.ext.Expectations.report(Seq(
      ("t", clean, Seq("id_null" -> $"id".isNull)))).head()
    assert((ok.getAs[Long]("n_violations"), ok.getAs[Long]("pass")) ===
      ((0L, 1L)))
  }

  test("autocorrelation == brute double ACF within 1 ppm; alternating " +
    "series reads ~-1 at lag 1; constant series reads 0") {
    import spark.implicits._
    val xs = Seq(3L, 7L, 4L, 9L, 12L, 5L, 8L, 11L, 6L, 10L)
    val df = xs.zipWithIndex.map { case (x, i) => (i, x) }.toDF("t", "x")
    val got = graft.ext.Stats.autocorrelation(df, "t", "x", maxLag = 3)
      .collect().map(r => r.getAs[Long]("lag") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("acf_ppm")))).toMap
    val mean = xs.sum.toDouble / xs.size
    val den = xs.map(x => (x - mean) * (x - mean)).sum
    for (l <- 1 to 3) {
      val num = xs.dropRight(l).zip(xs.drop(l))
        .map { case (a, b) => (a - mean) * (b - mean) }.sum
      val (np, ppm) = got(l.toLong)
      assert(np === (xs.size - l).toLong)
      assert(math.abs(ppm - num / den * 1e6) <= 1.0, s"lag $l")
    }
    val alt = (0 until 20).map(i => (i, if (i % 2 == 0) 10L else 0L))
      .toDF("t", "x")
    val a1 = graft.ext.Stats.autocorrelation(alt, "t", "x", 1).head()
    assert(a1.getAs[Long]("acf_ppm") < -900000L)
    val const = (0 until 8).map(i => (i, 5L)).toDF("t", "x")
    assert(graft.ext.Stats.autocorrelation(const, "t", "x", 1).head()
      .getAs[Long]("acf_ppm") === 0L)
  }

  test("cusumChangePoint finds the planted shift day; ties break " +
    "earliest") {
    import spark.implicits._
    // mean shifts up at t = 12: CUSUM trough is at the last
    // pre-shift period (t = 11)
    val xs = (0 until 20).map(i => (i, if (i < 12) 10L else 30L))
    val r = graft.ext.Stats.cusumChangePoint(xs.toDF("t", "x"), "t", "x")
      .head()
    assert(r.getAs[Long]("n_periods") === 20L)
    assert(r.getAs[Int]("change_t") === 11)
    // brute the ppm: max |n*S_t| over prefixes / (n * total)
    val n = xs.size.toLong
    val s = xs.map(_._2).sum
    val devs = xs.map(_._2).scanLeft(0L)((acc, x) => acc + n * x - s)
      .tail.map(math.abs)
    assert(r.getAs[Long]("dev_ppm") === devs.max * 1000000L / (n * s))
    // constant series: every prefix deviation is 0 -> earliest period
    val cst = (0 until 5).map(i => (i, 4L)).toDF("t", "x")
    assert(graft.ext.Stats.cusumChangePoint(cst, "t", "x").head()
      .getAs[Int]("change_t") === 0)
  }

  test("theilSenSlope == brute pairwise-slope median; an outlier day " +
    "cannot move it") {
    import spark.implicits._
    val xs = Seq((0L, 10L), (1L, 13L), (2L, 15L), (3L, 19L), (4L, 21L),
      (5L, 500L), (6L, 28L), (7L, 31L)) // one burst day
    val df = xs.toDF("t", "x")
    def slMicro(a: (Long, Long), b: (Long, Long)): Long = {
      val num = b._2 - a._2; val den = b._1 - a._1
      if (num < 0) -((-num) * 1000000L / den) else num * 1000000L / den
    }
    val slopes = (for (i <- xs.indices; j <- xs.indices if i < j)
      yield (slMicro(xs(i), xs(j)), xs(i)._1, xs(j)._1)).sorted
    val expect = slopes((slopes.size + 1) / 2 - 1)._1
    val r = graft.ext.Stats.theilSenSlope(df, "t", "x").head()
    assert(r.getAs[Long]("n_periods") === 8L)
    assert(r.getAs[Long]("n_pairs") === 28L)
    assert(r.getAs[Long]("slope_micro") === expect)
    // robust: despite the 500 burst the trend reads ~3/day, not ~70
    assert(r.getAs[Long]("slope_micro") < 4000000L &&
      r.getAs[Long]("slope_micro") > 2000000L)
  }

  test("mannKendall == brute S and tie-corrected z; monotone series " +
    "maxes S; constant series reads 0") {
    import spark.implicits._
    val xs = Seq(3L, 7L, 5L, 5L, 9L, 8L, 12L, 11L, 14L, 13L)
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("t", "x")
    val sStat = (for (i <- xs.indices; j <- xs.indices if i < j)
      yield java.lang.Long.signum(xs(j) - xs(i)).toLong).sum
    val m = xs.size.toLong
    val tie = xs.groupBy(identity).values
      .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val varS = (m * (m - 1) * (2 * m + 5) - tie).toDouble / 18.0
    val zExp = math.floor((sStat - 1).toDouble / math.sqrt(varS) * 1e6 +
      0.5).toLong
    val r = graft.ext.Stats.mannKendall(df, "t", "x").head()
    assert(r.getAs[Long]("s_stat") === sStat)
    assert(r.getAs[Long]("z_ppm") === zExp)
    val mono = (0 until 6).map(i => (i.toLong, i * 10L)).toDF("t", "x")
    assert(graft.ext.Stats.mannKendall(mono, "t", "x").head()
      .getAs[Long]("s_stat") === 15L)
    val cst = (0 until 6).map(i => (i.toLong, 5L)).toDF("t", "x")
    val cr = graft.ext.Stats.mannKendall(cst, "t", "x").head()
    assert(cr.getAs[Long]("s_stat") === 0L)
    assert(cr.getAs[Long]("z_ppm") === 0L)
  }

  test("etaSquared == brute ANOVA decomposition within 2 ppm; " +
    "group-determined values read ~1e6; shuffled labels read ~0") {
    import spark.implicits._
    val rows = Seq(("a", 10L), ("a", 12L), ("a", 11L), ("b", 30L),
      ("b", 29L), ("b", 34L), ("c", 50L), ("c", 52L), ("c", 48L))
    val df = rows.map(_.swap).toDF("x", "grp")
    val mean = rows.map(_._2).sum.toDouble / rows.size
    val sst = rows.map(r => (r._2 - mean) * (r._2 - mean)).sum
    val ssb = rows.groupBy(_._1).values.map { g =>
      val gm = g.map(_._2).sum.toDouble / g.size
      g.size * (gm - mean) * (gm - mean)
    }.sum
    val r = graft.ext.Stats.etaSquared(df, "x", "grp").head()
    assert(r.getAs[Long]("n") === 9L)
    assert(r.getAs[Long]("n_groups") === 3L)
    assert(math.abs(r.getAs[Long]("eta2_ppm") -
      math.floor(ssb / sst * 1e6)) <= 2.0)
    // constant within groups: the factor explains EVERYTHING
    val pure = Seq(("a", 5L), ("a", 5L), ("b", 9L), ("b", 9L))
      .map(_.swap).toDF("x", "grp")
    assert(graft.ext.Stats.etaSquared(pure, "x", "grp").head()
      .getAs[Long]("eta2_ppm") === 1000000L)
    val e = intercept[Exception] {
      graft.ext.Stats.etaSquared(
        Seq((Some("a"), 1L), (None: Option[String], 2L))
          .toDF("grp", "x"), "x", "grp").collect()
    }
    assert(e.getMessage.contains("etaSquared: NULL"))
  }

  test("kruskalWallis == brute textbook H with average ranks and tie " +
    "correction; separated groups dominate; all-tied reads 0") {
    import spark.implicits._
    val rows = Seq(("a", 3L), ("a", 5L), ("a", 5L), ("b", 8L),
      ("b", 9L), ("b", 5L), ("c", 12L), ("c", 14L), ("c", 9L),
      ("c", 15L))
    val df = rows.zipWithIndex
      .map { case ((g, v), i) => (v, i.toLong, g) }
      .toDF("v", "id", "grp")
    // brute: average ranks over the pooled sample
    val sorted = rows.map(_._2).sorted
    def avgRank(v: Long): Double = {
      val idx = sorted.zipWithIndex.filter(_._1 == v).map(_._2 + 1)
      idx.sum.toDouble / idx.size
    }
    val n = rows.size
    val hNum = rows.groupBy(_._1).values.map { g =>
      val rg = g.map(r => avgRank(r._2)).sum
      rg * rg / g.size
    }.sum
    val tie = rows.map(_._2).groupBy(identity).values
      .map(g => { val t = g.size.toLong; (t * t * t - t).toDouble }).sum
    val h = (12.0 / (n * (n + 1)) * hNum - 3 * (n + 1)) /
      (1.0 - tie / (n.toDouble * n * n - n))
    val r = graft.ext.Stats.kruskalWallis(df, "v", "grp").head()
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("n_groups") === 3L)
    // per-group micro floors: within a few micro of the double H
    assert(math.abs(r.getAs[Long]("h_micro") - h * 1e6) <= 5.0,
      s"got ${r.getAs[Long]("h_micro")} want ~${h * 1e6}")
    val flat = Seq((5L, 1L, "a"), (5L, 2L, "b"), (5L, 3L, "a"))
      .toDF("v", "id", "grp")
    assert(graft.ext.Stats.kruskalWallis(flat, "v", "grp").head()
      .getAs[Long]("h_micro") === 0L)
  }

  test("q268 quantile normalization == brute rank->order-statistic " +
    "mapping on a hand fixture") {
    import spark.implicits._
    // source A short docs, source B long docs, source C spans both
    val rows = (0 until 30).map { i =>
      val (src, x) = (i % 3) match {
        case 0 => ("A", 10L + i)
        case 1 => ("B", 1000L + i)
        case _ => ("C", 10L * i)
      }
      (i.toLong, src, x)
    }
    val dir = tmpDir("q268fix")
    rows.toDF("doc_id", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // brute: per source sort by (x, id), map rank -> global order stat
    val n = rows.size.toLong
    val globalSorted = rows.sortBy(r => (r._3, r._1)).map(_._3)
    val brute = rows.groupBy(_._2).map { case (src, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._1))
      val ns = sorted.size.toLong
      val mapped = sorted.zipWithIndex.map { case (_, idx) =>
        val rk = idx + 1L
        val p = (rk * n + ns - 1) / ns
        globalSorted((p - 1).toInt)
      }
      src -> ((mapped.map(identity).sum * 1000000L) / ns,
        (sorted.map(_._3).sum * 1000000L) / ns)
    }
    val got = graft.queries.Extended28.queries("q268_quantile_normalize")(
        spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("mean_after_micro"),
          r.getAs[Long]("mean_before_micro")))).toMap
    for ((src, (after, before)) <- brute) {
      assert(got(src) === ((after, before)), s"source $src")
    }
    // the normalized means all land near the corpus mean
    val corpusMeanMicro = rows.map(_._3).sum * 1000000L / n
    for ((_, (after, _)) <- got) {
      assert(math.abs(after - corpusMeanMicro).toDouble <
        0.2 * corpusMeanMicro)
    }
  }
}
