package graft

import org.apache.spark.sql.functions._

/** Round-13 spectral batch (q228/q229). The oracle gates the fixture
  * numbers; these pin the operator contracts — direction recovery,
  * determinism, the rank-1 and isotropic end-points, and the
  * all-but-the-top removal actually removing the component.
  */
class Extended23Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planted(n: Int) = {
    import spark.implicits._
    // dominant direction d = (1,1,0,0)/√2 with amplitude ±(i mod 7),
    // plus a small deterministic wobble on dims 3/4
    (0L until n.toLong).map { i =>
      val t = (i % 7).toDouble - 3.0
      val w = 0.05 * ((i % 11).toDouble - 5.0)
      (i, Seq((5.0 + t * 0.7071).toFloat, (2.0 + t * 0.7071).toFloat,
        (1.0 + w).toFloat, (1.0 - w).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("topComponentConverged: stops at tol with the same direction, " +
    "loud when the budget can't reach it") {
    val e = planted(220)
    val (_, pcFixed) = graft.ext.Spectral.topComponent(e, "embedding", 12)
    val (_, pc, res) = graft.ext.Spectral
      .topComponentConverged(e, "embedding", tol = 1e-4, maxIterations = 16)
    assert(res.last._3 <= 1e-4, s"did not converge: $res")
    assert(res.length < 16, "early stop never fired")
    // same direction as a generously-iterated fixed run
    val cos = pc.zip(pcFixed).map { case (a, b) => a.toDouble * b }.sum
    assert(math.abs(cos) > 0.9999, s"direction drifted: $cos")
    // an unreachable tol inside a tiny budget fails LOUDLY
    val ex = intercept[IllegalStateException] {
      graft.ext.Spectral.topComponentConverged(e, "embedding",
        tol = 1e-13, maxIterations = 2)
    }
    assert(ex.getMessage.contains("raise"), ex.getMessage)
  }

  test("topComponent recovers a planted dominant direction; deterministic") {
    val e = planted(220)
    val (mu, pc) = graft.ext.Spectral.topComponent(e, "embedding", 6)
    // unit norm
    val norm = pc.map(x => x.toDouble * x.toDouble).sum
    assert(math.abs(norm - 1.0) < 1e-6, s"pc not unit: $norm")
    // cosine with the planted direction (±: power iteration fixes the
    // sign via v0, but the PLANTED sign is arbitrary)
    val cosD = (pc(0) + pc(1)).toDouble / math.sqrt(2.0)
    assert(math.abs(cosD) > 0.999, s"pc missed planted direction: ${pc.toSeq}")
    // mean recovered
    assert(math.abs(mu(0) - 5.0f) < 0.1f && math.abs(mu(2) - 1.0f) < 0.1f)
    // byte-for-byte deterministic across runs
    val (mu2, pc2) = graft.ext.Spectral.topComponent(e, "embedding", 6)
    assert(mu.toSeq === mu2.toSeq && pc.toSeq === pc2.toSeq)
  }

  test("topShare: rank-1 corpus reads ~1e6; removal kills the component") {
    import spark.implicits._
    // exactly rank-1 around the mean: x = μ + t·d. NOTE d must not be
    // orthogonal to the all-ones start v₀ (x = μ + t·(1,−1,0) has
    // ⟨d, v₀⟩ = 0 and a rank-1 corpus then gives the iteration nothing
    // to amplify — the collapse guard fires; found in spec dev)
    val rank1 = (0L until 64L).map { i =>
      val t = (i % 8).toDouble - 3.5
      (i, Seq((1.0 + t).toFloat, (2.0 - 0.5 * t).toFloat, 3.0f))
    }.toDF("vec_id", "embedding")
    val (mu, pc) = graft.ext.Spectral.topComponent(rank1, "embedding", 5)
    val share = graft.ext.Spectral
      .topShare(rank1, "embedding", mu, pc).head()
    assert(share.getAs[Long]("share_ppm") > 999000L,
      s"rank-1 corpus must be ~fully explained: $share")
    // all-but-the-top: residual energy along pc is ~zero
    val removed = graft.ext.Spectral
      .removeTop(rank1, "embedding", mu, pc, "resid")
    val residShare = graft.ext.Spectral
      .topShare(removed, "resid", mu, pc).head()
    assert(residShare.getAs[Long]("top_micro") <
      share.getAs[Long]("top_micro") / 1000L,
      s"removal left energy along pc: $residShare vs $share")
  }

  test("brierMicro2: hand values; perfect-confident 0; confident-wrong maximal") {
    import spark.implicits._
    // (label, pred, conf): right@0.9 → (9e5−1e6)² = 1e10;
    // wrong@0.4 → (4e5)² = 1.6e11; right@1.0 → 0
    val scored = Seq((0, 0, 900000L), (0, 1, 400000L), (1, 1, 1000000L))
      .toDF("label", "pred", "conf_micro")
    val b = graft.ext.Eval
      .brierMicro2(scored, "label", "pred", "conf_micro").head()
    assert(b.getAs[Long]("sum_micro2") === 10000000000L + 160000000000L)
    assert(b.getAs[Long]("brier_micro2") === 170000000000L / 3)
    // perfectly calibrated and correct → exactly 0
    val perfect = Seq((0, 0, 1000000L), (1, 1, 1000000L))
      .toDF("label", "pred", "conf_micro")
    assert(graft.ext.Eval
      .brierMicro2(perfect, "label", "pred", "conf_micro").head()
      .getAs[Long]("brier_micro2") === 0L)
    // fully confident and always wrong → the 1e12 maximum
    val worst = Seq((0, 1, 1000000L), (1, 0, 1000000L))
      .toDF("label", "pred", "conf_micro")
    assert(graft.ext.Eval
      .brierMicro2(worst, "label", "pred", "conf_micro").head()
      .getAs[Long]("brier_micro2") === 1000000000000L)
  }

  test("NULL guards fail loudly: unscored rows in brier, null labels in balanced accuracy") {
    import spark.implicits._
    val holey = Seq((0, 0, Some(900000L)), (0, 0, None))
      .toDF("label", "pred", "conf_micro")
    val e1 = intercept[Exception] {
      graft.ext.Eval.brierMicro2(holey, "label", "pred", "conf_micro")
        .head()
    }
    assert(e1.getMessage != null)
    val nullLab = Seq((Some(0), 0), (None, 0)).toDF("label", "pred")
    val e2 = intercept[Exception] {
      graft.ext.Eval.balancedAccuracyPpm(nullLab, "label", "pred").head()
    }
    assert(e2.getMessage != null)
  }

  test("balancedAccuracyPpm: constant majority predictor reads 1/k, not the majority share") {
    import spark.implicits._
    // 90 rows of class 0, 10 of class 1; predictor always says 0:
    // plain accuracy 90%, balanced accuracy exactly 50%
    val skew = ((0 until 90).map(_ => (0, 0)) ++ (0 until 10).map(_ => (1, 0)))
      .toDF("label", "pred")
    val ba = graft.ext.Eval.balancedAccuracyPpm(skew, "label", "pred").head()
    assert(ba.getAs[Long]("n_classes") === 2L)
    assert(ba.getAs[Long]("balanced_acc_ppm") === 500000L)
    // perfect predictor reads exactly 1e6
    val perfect = (0 until 30).map(i => (i % 3, i % 3)).toDF("label", "pred")
    assert(graft.ext.Eval.balancedAccuracyPpm(perfect, "label", "pred")
      .head().getAs[Long]("balanced_acc_ppm") === 1000000L)
  }

  test("fixture: PC1 unit-norm, share strictly between isotropy and rank-1") {
    val e = graft.queries.Tables.load(spark, dir, "embeddings")
    val (mu, pc) = graft.ext.Spectral.topComponent(e, "embedding", 4)
    assert(math.abs(pc.map(x => x.toDouble * x.toDouble).sum - 1.0) < 1e-6)
    val share = graft.ext.Spectral.topShare(e, "embedding", mu, pc)
      .head().getAs[Long]("share_ppm")
    // one of 64 dims of an isotropic cloud would read ~15625 ppm; the
    // synthetic fixture is nearly isotropic (10 cluster directions,
    // measured 24512 ppm ≈ 1.57× isotropy), so PC1 must sit strictly
    // above the isotropy floor and far below rank-1
    assert(share > 15625L && share < 999000L,
      s"fixture PC1 share out of band: $share ppm")
  }
}
