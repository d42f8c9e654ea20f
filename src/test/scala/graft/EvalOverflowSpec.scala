package graft

import org.apache.spark.sql.functions._

/** The Exact-carrier contract: every integer read-out in the eval
  * family stays EXACT past the point where its old 64-bit arithmetic
  * wrapped (ANSI off) or threw an anonymous ARITHMETIC_OVERFLOW (ANSI
  * on). Each test drives a fixture past the documented old bound and
  * reads either the exact answer (computed independently with BigInt
  * on the driver) or the loud, named failure of a magnitude column
  * that genuinely no longer fits 64 bits.
  */
class EvalOverflowSpec extends SparkSpec {
  import graft.ext.Eval

  test("brierMicro2: exact mean past the old Long sum bound; " +
    "sum_micro2 read-out fails loudly, named") {
    // 10M adversarial rows, per-row se = (0 - 10^6)^2 = 10^12:
    // true sum 10^19 > Long.Max — the old Long sum could not hold it.
    val n = 10000000L
    val scored = spark.range(n).select(
      lit(1).as("label"), lit(1).as("pred"), lit(0L).as("conf_micro"))
    val out = Eval.brierMicro2(scored, "label", "pred", "conf_micro")
    // the mean is per-row-bounded and must come back exact
    val r = out.select("n", "correct", "brier_micro2").head()
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("correct") === n)
    assert(r.getAs[Long]("brier_micro2") === 1000000000000L)
    // the raw sum genuinely exceeds 64 bits → loud, named refusal
    val e = intercept[Exception] {
      out.select("sum_micro2").head()
    }
    assert(e.getMessage.contains("brierMicro2: sum_micro2"),
      s"expected the named overflow message, got: ${e.getMessage}")
  }

  test("cohenKappaFromCounts: exact at n = 10^13 (pesum ~ 10^25, " +
    "far past any 64-bit product)") {
    import spark.implicits._
    val t = 1000000000000L // 10^12
    val counts = Seq(
      (0, 0, 4 * t), (0, 1, 1 * t), (1, 0, 2 * t), (1, 1, 3 * t))
      .toDF("label", "pred", "n")
    val r = Eval.cohenKappaFromCounts(counts, "label", "pred", "n").head()
    // independent BigInt replica of the documented formula
    val n = BigInt(10) * t
    val correct = BigInt(7) * t
    val pesum = (BigInt(5) * t) * (BigInt(6) * t) +
      (BigInt(5) * t) * (BigInt(4) * t)
    val po = correct * 1000000 / n
    val pe = pesum * 1000000 / (n * n)
    val kappa = (po - pe) * 1000000 / (1000000 - pe)
    assert(r.getAs[Long]("n") === n.toLong)
    assert(r.getAs[Long]("correct") === correct.toLong)
    assert(r.getAs[Long]("po_ppm") === po.toLong)
    assert(r.getAs[Long]("pe_ppm") === pe.toLong)
    assert(r.getAs[Long]("kappa_ppm") === kappa.toLong)
  }

  test("weightedKappaPpm: exact past the old n*wo*10^6 Long bound") {
    // 2M rows, labels {0, 9}: numerator n*wo_sum*10^6 = 8.1*10^19
    // > Long.Max — the old form threw/wrapped at ~3*10^5 such rows.
    val n = 2000000L
    val pred = spark.range(n).select(
      ((col("id") % 2) * 9).as("label"),
      when(col("id") % 4 === 3, lit(0L))
        .otherwise((col("id") % 2) * 9).as("pred"))
    val r = Eval.weightedKappaPpm(pred, "label", "pred").head()
    // analytic: cells (0,0,n/2) (9,9,n/4) (9,0,n/4);
    // wo = 81*n/4; we = 81*n^2/2 → kappa = 10^6 - 500000
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("wo_sum") === 81L * n / 4)
    val we = BigInt(81) * BigInt(n) * BigInt(n) / 2
    assert(r.getAs[Long]("we_sum") === we.toLong)
    val kappa = BigInt(1000000) -
      BigInt(n) * (BigInt(81) * n / 4) * 1000000 / we
    assert(r.getAs[Long]("kappa_w_ppm") === kappa.toLong)
  }

  test("fleissKappaPpm: exact past the old ck2*10^6 Long bound") {
    // 2M items x 3 raters: ck2 ~ 1.85*10^13, x10^6 = 1.85*10^19
    // > Long.Max. Raters 1/2 vote id%2; rater 3 flips on id%4 == 3.
    val n = 2000000L
    val df = spark.range(n).select(col("id").as("item"),
      (col("id") % 2).as("r1"), (col("id") % 2).as("r2"),
      when(col("id") % 4 === 3, lit(1L) - col("id") % 2)
        .otherwise(col("id") % 2).as("r3"))
    val r = Eval.fleissKappaPpm(df, "item", Seq("r1", "r2", "r3")).head()
    // independent BigInt replica from the analytic marginals:
    // s2 = 3n/4*9 + n/4*5 = 8n; ck = (7n/4, 5n/4)
    val nB = BigInt(n)
    val s2 = 8 * nB
    val ck2 = (7 * nB / 4) * (7 * nB / 4) + (5 * nB / 4) * (5 * nB / 4)
    val pbar = (s2 - 3 * nB) * 1000000 / (nB * 3 * 2)
    val pe = ck2 * 1000000 / ((nB * 3) * (nB * 3))
    val kappa = (pbar - pe) * 1000000 / (1000000 - pe)
    assert(r.getAs[Long]("n_items") === n)
    assert(r.getAs[Long]("pbar_ppm") === pbar.toLong)
    assert(r.getAs[Long]("pe_ppm") === pe.toLong)
    assert(r.getAs[Long]("kappa_ppm") === kappa.toLong)
  }

  test("calibrationBins: NULL confidence and NULL label fail loudly") {
    import spark.implicits._
    val holey = Seq((Some(1), Some(1), None: Option[Long]),
      (Some(1), Some(1), Some(900000L)))
      .toDF("label", "pred", "conf_micro")
    val e1 = intercept[Exception] {
      Eval.calibrationBins(holey, "label", "pred", "conf_micro").collect()
    }
    assert(e1.getMessage.contains("calibrationBins: NULL in 'conf_micro'"))
    val nullLab = Seq((None: Option[Int], Some(1), Some(900000L)),
      (Some(1), Some(1), Some(900000L)))
      .toDF("label", "pred", "conf_micro")
    val e2 = intercept[Exception] {
      Eval.calibrationBins(nullLab, "label", "pred", "conf_micro").collect()
    }
    assert(e2.getMessage.contains("calibrationBins: NULL in 'label'"))
  }

  test("calibrationBins: ECE row exact on a large skewed fixture") {
    // 4M rows all in one bin with conf sum 3.6*10^18 (fits) — the ECE
    // fold n*conf_ppm ran in Long before; verify the decimal path
    // reproduces the small-fixture arithmetic identically.
    val n = 4000000L
    val scored = spark.range(n).select(
      lit(1).as("label"),
      when(col("id") % 4 === 0, lit(0)).otherwise(lit(1)).as("pred"),
      lit(900000L).as("conf_micro"))
    val rows = Eval.calibrationBins(scored, "label", "pred", "conf_micro")
      .collect()
    val ece = rows.find(_.getAs[Long]("bin") === -1L).get
    assert(ece.getAs[Long]("n") === n)
    assert(ece.getAs[Long]("acc_ppm") === 750000L)
    assert(ece.getAs[Long]("conf_ppm") === 900000L)
    assert(ece.getAs[Long]("gap_ppm") === 150000L)
  }
}
