package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch — the rank/quantile member of the sketch
  * shelf beside HLL (distinct counts, q117) and Count-Min (frequencies,
  * q147): per-shard sketches merge into a corpus sketch WITHOUT
  * touching raw values again, the shard-then-merge profile job a 100 TB
  * pipeline runs instead of a global sort.
  *
  * Design: log-bucket relative-error histogram (the DDSketch layout —
  * Masson/Rim/Lee, VLDB 2019): a positive value x lands in bucket
  * ⌈log_γ(x)⌉ with γ = (1+α)/(1−α), so every bucket spans a (1±α)
  * relative range and the quantile read back from the bucket midpoint
  * 2γ^b/(γ+1) is within α of the true quantile VALUE — a
  * relative-error guarantee at every quantile, not just the middle.
  *
  * Chosen over KLL/t-digest deliberately: their compaction/centroid
  * steps depend on merge ORDER, so a distributed aggregation (whose
  * partition-merge order is nondeterministic) yields run-dependent
  * sketches — poison for a bit-exact correctness gate and for
  * retry-idempotent pipelines. Log-bucket counts are pure sums:
  * deterministic under ANY merge order, associative, commutative. The
  * trade is a value-RANGE-dependent size (one bucket per γ-interval
  * spanned, ~⌈ln(max/min)/ln γ⌉ ≈ 1,400 buckets for 12 decades at
  * α = 0.01) vs KLL's range-free O(1/α·log log n) — at pipeline scales
  * both are kilobytes; determinism wins.
  *
  * Scale shape: [[sketch]] is one map-side-combinable keyed agg over
  * the data; [[merge]] aggregates sketch rows only (never data);
  * [[quantiles]] collapses the BOUNDED bucket frame to one array row
  * (the sketch-sized collect the operator exists to make safe — same
  * contract as the IVF centroid table) and walks it with an aggregate
  * HOF — no window, no global sort, no per-row work anywhere.
  */
object QuantileSketch {

  /** γ = (1+α)/(1−α): consecutive bucket boundaries ratio. */
  def gamma(alpha: Double): Double = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    (1 + alpha) / (1 - alpha)
  }

  /** Bucket index of a POSITIVE value: ⌈log_γ(x)⌉. Callers shard
    * non-positive values separately (the standard DDSketch zero/negative
    * stores) — this core covers the positive store. */
  def bucketOf(value: Column, alpha: Double): Column =
    ceil(log(value) / lit(math.log(gamma(alpha)))).cast("int")

  /** Midpoint estimate for a bucket: 2γ^b/(γ+1), within α relative
    * error of every value in the bucket. */
  def estimateOf(bucket: Column, alpha: Double): Column = {
    val g = gamma(alpha)
    lit(2.0) * pow(lit(g), bucket.cast("double")) / lit(g + 1.0)
  }

  /** Build per-key sketches: one (keys..., bucket, cnt) row per
    * occupied bucket. One keyed agg, map-side combinable. */
  def sketch(df: DataFrame, valueCol: String, alpha: Double,
      keyCols: Seq[String] = Nil): DataFrame =
    df.groupBy((keyCols.map(col) :+
        bucketOf(col(valueCol), alpha).as("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketch rows (e.g. per-shard sketches) into one sketch per
    * remaining key: counts are pure sums — associative, commutative,
    * deterministic under any merge order. */
  def merge(sketches: DataFrame, keyCols: Seq[String] = Nil): DataFrame =
    sketches.groupBy((keyCols.map(col) :+ col("bucket")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates from ONE merged sketch (no key columns): for
    * each q‰ the midpoint estimate of the bucket containing the
    * ⌈q·n/1000⌉-th value. The sketch frame is bounded by construction
    * (≈ ln(max/min)/ln γ rows), so collapsing it to a single sorted
    * array row is a sketch-sized agg, not a data collect; the rank walk
    * is an aggregate HOF over that array.
    *
    * @return (q_permille, n, est) — est is the only non-exact column;
    *         downstream gates should compare it against exact
    *         quantiles as a within-α boolean (the q117 technique)
    */
  def quantiles(sketch: DataFrame, alpha: Double,
      qsPermille: Seq[Int]): DataFrame = {
    require(qsPermille.nonEmpty && qsPermille.forall(q => q >= 1 && q <= 1000),
      s"quantiles must be permille in [1,1000], got $qsPermille")
    val spark = sketch.sparkSession
    import spark.implicits._
    val packed = sketch
      .agg(sort_array(collect_list(struct(col("bucket"), col("cnt"))))
        .as("sk"), sum(col("cnt")).as("n"))
    qsPermille.toDF("q_permille")
      .crossJoin(broadcast(packed))
      .withColumn("target", expr("(q_permille * n + 999) div 1000"))
      .withColumn("sel", expr(
        """aggregate(sk,
          |  named_struct('cum', CAST(0 AS BIGINT), 'sel', CAST(NULL AS INT)),
          |  (acc, x) -> named_struct(
          |    'cum', acc.cum + x.cnt,
          |    'sel', CASE WHEN acc.sel IS NOT NULL THEN acc.sel
          |                WHEN acc.cum + x.cnt >= target THEN x.bucket
          |                ELSE CAST(NULL AS INT) END),
          |  acc -> acc.sel)""".stripMargin))
      .select(col("q_permille").cast("long").as("q_permille"), col("n"),
        estimateOf(col("sel"), alpha).as("est"))
  }
}
