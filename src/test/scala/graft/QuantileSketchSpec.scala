package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ext.QuantileSketch

/** ext/QuantileSketch contracts:
  *
  *  - merge(per-shard sketches) == the sketch built globally in one
  *    pass (the mergeability property a shard-then-merge profile job
  *    rests on) — exact frame equality, any sharding;
  *  - every quantile estimate is within α relative error of the exact
  *    lower quantile, on uniform AND heavy-tailed random data;
  *  - results are partition-layout invariant (pure count sums — the
  *    determinism KLL/t-digest compaction cannot give);
  *  - the bucket↔midpoint roundtrip keeps every positive value within
  *    α of its estimate (the per-value invariant the quantile bound
  *    derives from).
  */
class QuantileSketchSpec extends SparkSpec {

  private val alpha = 0.01

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))

  private def exactLower(sorted: Vector[Long], qPermille: Int): Long = {
    val n = sorted.length.toLong
    val target = ((qPermille * n + 999) / 1000).toInt // ceil rank
    sorted(target - 1)
  }

  test("merge of per-shard sketches == global one-pass sketch") {
    import spark.implicits._
    val vals = samples(Gen.chooseNum(1L, 5000000L), 2000, 31L)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    for (shards <- Seq(2, 7, 32)) {
      val sharded = df.withColumn("shard",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash($"id"),
          org.apache.spark.sql.functions.lit(shards)))
      val merged = QuantileSketch.merge(
          QuantileSketch.sketch(sharded, "v", alpha, Seq("shard")))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val global = QuantileSketch.sketch(df, "v", alpha)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(merged === global, s"shards=$shards")
    }
  }

  test("quantile estimates within alpha of exact, uniform and heavy-tailed") {
    import spark.implicits._
    val uniform = samples(Gen.chooseNum(100L, 9000000L), 3000, 77L)
    // heavy tail: x = 2^k spread over 9 decades — stresses many buckets
    val heavy = samples(Gen.chooseNum(0, 30), 3000, 99L)
      .map(k => (1L << k) + k)
    for ((vals, tag) <- Seq((uniform, "uniform"), (heavy, "heavy"))) {
      val df = vals.map(Tuple1(_)).toDF("v")
      val sk = QuantileSketch.sketch(df, "v", alpha)
      val qs = Seq(10, 100, 250, 500, 750, 900, 990)
      val est = QuantileSketch.quantiles(sk, alpha, qs)
        .collect().map(r => r.getLong(0).toInt -> r.getDouble(2)).toMap
      val sorted = vals.sorted.toVector
      qs.foreach { q =>
        val exact = exactLower(sorted, q).toDouble
        assert(math.abs(est(q) - exact) <= alpha * 1.02 * exact,
          s"$tag q=$q est=${est(q)} exact=$exact")
      }
    }
  }

  test("sketch and quantiles are partition-layout invariant") {
    import spark.implicits._
    val vals = samples(Gen.chooseNum(1L, 800000L), 1500, 55L)
    val df = vals.map(Tuple1(_)).toDF("v")
    val a = QuantileSketch.quantiles(
        QuantileSketch.sketch(df, "v", alpha), alpha, Seq(250, 500, 750))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = QuantileSketch.quantiles(
        QuantileSketch.sketch(df.repartition(13), "v", alpha), alpha,
        Seq(250, 500, 750))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a === b)
  }

  test("bucket midpoint is within alpha of every positive value") {
    import spark.implicits._
    val vals = samples(Gen.chooseNum(1L, Long.MaxValue / 4), 2000, 13L)
    val df = vals.map(Tuple1(_)).toDF("v")
    val bad = df.select($"v",
        QuantileSketch.estimateOf(
          QuantileSketch.bucketOf($"v", alpha), alpha).as("est"))
      .filter(org.apache.spark.sql.functions.abs($"est" - $"v".cast("double"))
        > $"v".cast("double") * (alpha * 1.02))
      .count()
    assert(bad === 0L)
  }

  test("quantiles rejects out-of-range permille") {
    import spark.implicits._
    val sk = QuantileSketch.sketch(Seq(Tuple1(5L)).toDF("v"), "v", alpha)
    intercept[IllegalArgumentException] {
      QuantileSketch.quantiles(sk, alpha, Seq(0))
    }
    intercept[IllegalArgumentException] {
      QuantileSketch.quantiles(sk, alpha, Seq(1001))
    }
  }
}
