package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Labeled-data evaluation shelf: nearest-centroid classification and
  * agreement statistics — the QA pass a labeling/distillation pipeline
  * runs to ask "do these labels structure the embedding space, and how
  * far above chance is a trivial classifier?"
  *
  * All read-outs are exact integer arithmetic (counts and ppm by
  * integer division), the repo's oracle-stability discipline: a metric
  * whose last digit depends on float partial-aggregation order can't be
  * hash-gated or compared across engines.
  */
object Eval {

  /** Nearest-centroid prediction: per-label full-dimension centroids
    * (component means ROUNDED TO FLOAT — the [[VectorIndex]] discipline
    * that keeps a discrete argmax stable against partial-agg ulp
    * drift), then every row classified to its max-cosine centroid, ties
    * toward the larger label.
    *
    * Scale shape: one aggregation computes the centroids; they collect
    * to the driver as bounded metadata (labels × dim floats — the
    * [[VectorIndex.trainCentroids]] contract, the DATA never collects)
    * and come back as broadcast literals, so classification is one
    * codegen'd scan with no shuffle.
    *
    * @param labelCol integer label column
    * @return input rows plus a `pred` column
    */
  def centroidPredictions(emb: DataFrame, vecCol: String,
      labelCol: String): DataFrame = {
    val dim = emb.limit(1).select(size(col(vecCol)).cast("int")).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Int]))
      .getOrElse(throw new IllegalArgumentException(
        s"cannot infer vector dim: input is empty or '$vecCol' is null"))
    val cents: Array[(Int, Array[Float])] = emb
      .groupBy(col(labelCol).cast("int").as("__cl"))
      .agg(array((1 to dim).map(i =>
        (sum(element_at(col(vecCol), i)) / count(lit(1)))
          .cast("float")): _*).as("__c"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
    require(cents.nonEmpty, "no labels to build centroids from")
    def centroidLit(c: Array[Float]): Column =
      array(c.map(v => lit(v)): _*).cast("array<float>")
    val scores = cents.map { case (lab, c) =>
      struct(VectorFns.cosine(col(vecCol), centroidLit(c)).as("score"),
        lit(lab).as("pred"))
    }
    emb.withColumn("pred", greatest(scores.toSeq: _*).getField("pred"))
  }

  /** Exact confusion matrix: one row per (label, pred) pair that
    * occurs, with its count — the canonical classification read-out
    * every derived metric (accuracy, per-class P/R/F1, kappa) folds
    * from. One shuffle on the (label, pred) key. */
  def confusion(pred: DataFrame, labelCol: String,
      predCol: String): DataFrame =
    pred.groupBy(col(labelCol).cast("int").as("label"),
        col(predCol).cast("int").as("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("pred"))

  /** Cohen's kappa in exact ppm integers: observed agreement po against
    * the chance agreement pe implied by the two marginal distributions,
    * kappa = (po − pe) / (1 − pe). Computed entirely on counts:
    * po_ppm = correct·10⁶ div n, pe_ppm = Σ_k n_label(k)·n_pred(k)·10⁶
    * div n², kappa_ppm = (po_ppm − pe_ppm)·10⁶ div (10⁶ − pe_ppm) —
    * reproducible to the last digit on any engine (both Spark `div`
    * and the oracle's `//` truncate toward zero, including for a
    * below-chance negative kappa). Long arithmetic holds through
    * n ≈ 3·10⁹ rows (n² against Σ products); past that, lift to
    * DECIMAL.
    *
    * @return one row: (n, correct, po_ppm, pe_ppm, kappa_ppm)
    */
  def cohenKappaPpm(pred: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    val p = pred.select(col(labelCol).cast("int").as("__l"),
      col(predCol).cast("int").as("__p"))
    val totals = p.agg(count(lit(1)).as("n"),
      sum(when(col("__l") === col("__p"), 1L).otherwise(0L)).as("correct"))
    val pe = p.groupBy(col("__l")).agg(count(lit(1)).as("nt"))
      .join(p.groupBy(col("__p")).agg(count(lit(1)).as("np")),
        col("__l") === col("__p"))
      .agg(coalesce(sum(col("nt") * col("np")), lit(0L)).as("pesum"))
    totals.crossJoin(pe)
      .select(col("n"), col("correct"),
        expr("(correct * 1000000) div n").as("po_ppm"),
        expr("(pesum * 1000000) div (n * n)").as("pe_ppm"))
      .select(col("n"), col("correct"), col("po_ppm"), col("pe_ppm"),
        expr("((po_ppm - pe_ppm) * 1000000) div (1000000 - pe_ppm)")
          .as("kappa_ppm"))
  }
}
