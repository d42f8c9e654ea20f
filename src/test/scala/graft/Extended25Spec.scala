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
