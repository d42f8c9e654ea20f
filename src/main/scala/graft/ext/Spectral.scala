package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Spectral structure of an embedding corpus: the dominant principal
  * direction via DISTRIBUTED power iteration, and the "all-but-the-top"
  * variance read-out (Mu & Viswanath 2018: trained embedding spaces
  * concentrate a large variance share in a single common direction;
  * removing it improves downstream similarity).
  *
  * Scale shape: each power-iteration step is ONE aggregation — per row
  * the scalar y = ⟨x − μ, v⟩ (a native codegen'd dot against the
  * broadcast v), aggregated into the 64 component sums of Σ y·x plus
  * Σ y; the centering term folds algebraically (Σ y·(x−μ) = Σ y·x −
  * μ·Σ y), so the DATA is never centered or copied. k iterations =
  * k linear scans; the vector state lives on the driver as bounded
  * metadata. No shuffle anywhere (global agg only).
  *
  * Float discipline: μ and each iterate v are FLOAT-ROUNDED before
  * broadcast (the k-means/centroid precedent — rounding absorbs
  * partial-aggregation ulp drift so both engines iterate through the
  * SAME vectors); driver-side folds (norms, dot products) accumulate
  * left-to-right in double, matching SQL list_sum order.
  */
object Spectral {

  /** Global float-rounded component mean. */
  def meanVector(emb: DataFrame, vecCol: String): Array[Float] = {
    val dim = vecDim(emb, vecCol)
    emb.agg(VecOps.meanArray(vecCol, dim).as("m"))
      .head().getSeq[Float](0).toArray
  }

  /** Top principal direction of the centered corpus after `iterations`
    * power steps from the deterministic start v₀ = (1/√d, …, 1/√d).
    * Returns (μ, v) as float-rounded driver metadata. The sign of v is
    * fixed by v₀ (power iteration converges to ±PC1; a deterministic
    * start makes the sign reproducible). */
  def topComponent(emb: DataFrame, vecCol: String,
      iterations: Int = 4): (Array[Float], Array[Float]) = {
    require(iterations >= 1, "need at least one power step")
    val dim = vecDim(emb, vecCol)
    val mu = meanVector(emb, vecCol)
    var v: Array[Float] = Array.fill(dim)((1.0 / math.sqrt(dim.toDouble)).toFloat)
    var k = 0
    while (k < iterations) {
      val y = VectorFns.dot(col(vecCol), litF(v)) - lit(seqDot(mu, v))
      val row = emb.agg(
        array((1 to dim).map(i =>
          sum(y * element_at(col(vecCol), i))): _*).as("w"),
        sum(y).as("ys")).head()
      val w = row.getSeq[Double](0)
      val ys = row.getDouble(1)
      // Σ y·(x − μ) = Σ y·x − μ·Σ y, componentwise
      val c = Array.tabulate(dim)(j => w(j) - mu(j).toDouble * ys)
      var n2 = 0.0
      var j = 0
      while (j < dim) { n2 += c(j) * c(j); j += 1 }
      val norm = math.sqrt(n2)
      require(norm > 0.0,
        "power iteration collapsed to zero — corpus has no variance" +
          " along the current iterate")
      v = c.map(x => (x / norm).toFloat)
      k += 1
    }
    (mu, v)
  }

  /** Variance share of the top component, integer-exact read-out: per
    * row, total centered energy d² = ‖x − μ‖² and top-direction energy
    * y² = ⟨x − μ, v⟩² are each floored to micro units BEFORE the exact
    * integer sums (so partial-agg order can't move a digit);
    * share_ppm = top·10⁶ div total. One scan with two native dots per
    * row (the d² expansion reuses the silhouette trick).
    *
    * @return one row: (n, total_micro, top_micro, share_ppm)
    */
  def topShare(emb: DataFrame, vecCol: String, mu: Array[Float],
      v: Array[Float]): DataFrame = {
    val d2 = greatest(
      VectorFns.dot(col(vecCol), col(vecCol))
        - lit(2.0) * VectorFns.dot(col(vecCol), litF(mu))
        + lit(seqDot(mu, mu)), lit(0.0))
    val y = VectorFns.dot(col(vecCol), litF(v)) - lit(seqDot(mu, v))
    emb.select(
        floor(d2 * 1000000.0 + 0.5).cast("long").as("d2m"),
        floor(y * y * 1000000.0 + 0.5).cast("long").as("y2m"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("d2m")), lit(0L)).as("total_micro"),
        coalesce(sum(col("y2m")), lit(0L)).as("top_micro"))
      .select(col("n"), col("total_micro"), col("top_micro"),
        expr("CASE WHEN total_micro > 0 THEN" +
          " (top_micro * 1000000) div total_micro ELSE 0 END")
          .as("share_ppm"))
  }

  /** Remove the top component from every vector:
    * x' = x − ⟨x − μ, v⟩·v (the "all-but-the-top" correction, applied
    * around the mean). One scan, no shuffle; output is float. The
    * scalar y is materialized ONCE per row — referencing the dot
    * expression inside the zip_with lambda would re-evaluate the
    * d-element dot per output component (O(d²)/row). */
  def removeTop(emb: DataFrame, vecCol: String, mu: Array[Float],
      v: Array[Float], outCol: String): DataFrame = {
    val y = VectorFns.dot(col(vecCol), litF(v)) - lit(seqDot(mu, v))
    emb.withColumn("__abtt_y", y)
      .withColumn(outCol,
        zip_with(col(vecCol), litF(v),
          (x, vc) => (x.cast("double") - col("__abtt_y") * vc.cast("double"))
            .cast("float")))
      .drop("__abtt_y")
  }

  private def vecDim(emb: DataFrame, vecCol: String): Int =
    VecOps.vecDim(emb, vecCol)

  private def litF(a: Array[Float]): Column = VecOps.litF(a)

  private def seqDot(a: Array[Float], b: Array[Float]): Double =
    VecOps.seqDot(a, b)
}
