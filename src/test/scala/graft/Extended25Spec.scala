package graft

import org.apache.spark.sql.functions._

import graft.ext.Eval

/** Round-14 second batch: hand-value pins for the fairness gap and
  * the paired McNemar fold.
  */
class Extended25Spec extends SparkSpec {

  test("groupBalancedAccuracyPpm: per-group recalls, gap row, loud " +
    "NULL group") {
    import spark.implicits._
    // group 0: class 0 recall 1/2, class 1 recall 1 -> bacc 750000
    // group 1: class 0 recall 1, class 1 recall 1   -> bacc 1000000
    val pred = Seq(
      (0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 1),
      (1, 0, 0), (1, 1, 1)
    ).toDF("grp", "label", "pred")
    val rows = Eval.groupBalancedAccuracyPpm(pred, "label", "pred", "grp")
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_classes"),
          r.getAs[Long]("bacc_ppm"))).toMap
    assert(rows(0) === ((4L, 2L, 750000L)))
    assert(rows(1) === ((2L, 2L, 1000000L)))
    assert(rows(-1) === ((6L, 2L, 250000L)))
    val holey = Seq((Some(1), 0, 0), (None: Option[Int], 0, 0))
      .toDF("grp", "label", "pred")
    val e = intercept[Exception] {
      Eval.groupBalancedAccuracyPpm(holey, "label", "pred", "grp")
        .collect()
    }
    assert(e.getMessage.contains("groupBalancedAccuracyPpm: NULL in 'grp'"))
  }

  test("cochranQMicro: hand value; unanimous items read 0") {
    import spark.implicits._
    // correctness patterns (1,1,1),(1,1,0),(1,0,0),(0,0,0):
    // C = [3,2,1], T = 6, sumC2 = 14, sumR2 = 14
    // Q = 2*(3*14 - 36)/(3*6 - 14) = 12/4 = 3.0 -> 3,000,000 micro
    val df = Seq((1, 1, 1, 1), (1, 1, 1, 0), (1, 1, 0, 0), (1, 0, 0, 0))
      .toDF("label", "a", "b", "c")
    val r = Eval.cochranQMicro(df, "label", Seq("a", "b", "c")).head()
    assert(r.getAs[Long]("n_items") === 4L)
    assert(r.getAs[Long]("t") === 6L)
    assert(r.getAs[Long]("q_micro") === 3000000L)
    // unanimous rows only (all right or all wrong): denominator 0 -> 0
    val una = Seq((1, 1, 1, 1), (1, 0, 0, 0)).toDF("label", "a", "b", "c")
    assert(Eval.cochranQMicro(una, "label", Seq("a", "b", "c")).head()
      .getAs[Long]("q_micro") === 0L)
  }

  test("krippendorffAlphaPpm: hand value; perfect agreement reads 10^6") {
    import spark.implicits._
    // 2 raters, items (0,0) (1,1) (0,1): S2 = 4+4+2 = 10,
    // Do_num = 3*4-10 = 2, n = 6, marg (0:3, 1:3) -> dexp = 36-18 = 18
    // alpha = 1 - (2*5)/(1*18) -> 10^6 - 10^7 div 18 = 444445
    val df = Seq((0, 0), (1, 1), (0, 1)).toDF("r1", "r2")
    val a = Eval.krippendorffAlphaPpm(df, Seq("r1", "r2")).head()
    assert(a.getAs[Long]("n_items") === 3L)
    assert(a.getAs[Long]("alpha_ppm") === 1000000L - 10000000L / 18L)
    // perfect agreement over >= 2 classes
    val perfect = Seq((0, 0), (1, 1), (2, 2)).toDF("r1", "r2")
    assert(Eval.krippendorffAlphaPpm(perfect, Seq("r1", "r2")).head()
      .getAs[Long]("alpha_ppm") === 1000000L)
    // single-class corpus: no disagreement possible -> 10^6 convention
    val mono = Seq((7, 7), (7, 7)).toDF("r1", "r2")
    assert(Eval.krippendorffAlphaPpm(mono, Seq("r1", "r2")).head()
      .getAs[Long]("alpha_ppm") === 1000000L)
  }

  test("occupancySubBits: the integral occupancy law — largest b with " +
    "k*occ*2^b <= n, 0 below one full sub-bucket, capped at maxBits") {
    import graft.ext.VectorIndex.occupancySubBits
    // k*occ = 512 is the unit: below it the dial reads 0 (exact
    // SemDeDup geometry), and each corpus doubling adds one bit
    assert(occupancySubBits(511, 8, 64) === 0)
    assert(occupancySubBits(512, 8, 64) === 0)
    assert(occupancySubBits(1023, 8, 64) === 0)
    assert(occupancySubBits(1024, 8, 64) === 1)
    assert(occupancySubBits(4194304, 8, 64) === 13)
    // cap: a giant corpus cannot out-run the vector dim
    assert(occupancySubBits(Long.MaxValue / 2, 8, 64, maxBits = 16) === 16)
    // the q241 gate instances (embeddings fixture: 500 at sf0.01,
    // 2000 at sf0.1) — both exercise the hierarchical path
    assert(occupancySubBits(500, 8, 16) === 1)
    assert(occupancySubBits(2000, 8, 16) === 3)
  }

  test("agreement statistics fail LOUDLY on a NULL rater value — " +
    "never a silently-wrong complete-data statistic") {
    import spark.implicits._
    // a NULL rater used to be counted as disagreeing on every pair
    // (pairwise identity) AND as a phantom class in the marginals —
    // two inconsistent silent answers at once
    val withNull = Seq((Some(1), Some(1)), (Some(2), None), (Some(0), Some(0)))
      .toDF("r1", "r2")
    val ka = intercept[Exception] {
      Eval.krippendorffAlphaPpm(withNull, Seq("r1", "r2")).collect()
    }
    assert(ka.getMessage.contains("krippendorffAlphaPpm") &&
      ka.getMessage.contains("r2"), s"wrong message: ${ka.getMessage}")
    val fk = intercept[Exception] {
      Eval.fleissKappaPpm(withNull, "r1", Seq("r1", "r2")).collect()
    }
    assert(fk.getMessage.contains("fleissKappaPpm") &&
      fk.getMessage.contains("r2"), s"wrong message: ${fk.getMessage}")
  }

  test("mcnemarMicro: hand disagreement cells; agreement reads 0") {
    import spark.implicits._
    // 8 disagreement rows: b = 5 (A right, B wrong), c = 3 -> stat =
    // (|5-3|-1)^2 * 1e6 / 8 = 125000; 12 agreement rows don't move it
    val rows =
      Seq.fill(5)((1, 1, 0)) ++ Seq.fill(3)((1, 0, 1)) ++
      Seq.fill(7)((1, 1, 1)) ++ Seq.fill(5)((1, 0, 0))
    val df = rows.toDF("label", "a", "b")
    val r = Eval.mcnemarMicro(df, "label", "a", "b").head()
    assert(r.getAs[Long]("n") === 20L)
    assert(r.getAs[Long]("b") === 5L)
    assert(r.getAs[Long]("c") === 3L)
    assert(r.getAs[Long]("mcnemar_micro") === 125000L)
    // identical classifiers: b = c = 0 -> 0 by convention
    val same = Seq((1, 1, 1), (0, 1, 1)).toDF("label", "a", "b")
    assert(Eval.mcnemarMicro(same, "label", "a", "b").head()
      .getAs[Long]("mcnemar_micro") === 0L)
  }
}
