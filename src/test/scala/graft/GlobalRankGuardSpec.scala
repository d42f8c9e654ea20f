package graft

import org.apache.spark.sql.functions._

/** Round-13 advisor items on the two-pass rank/prefix-sum family:
  * typed value-column reads (an UnsafeRow `getLong` on an INT column
  * returns garbage for negatives — silently wrong sums), float-key
  * normalization to window PARTITION BY semantics, the
  * high-cardinality-key driver guard, and the persist-release
  * lifecycle. Plus the VectorIndex dim-probe guard (empty/null input
  * fails with a contract error, not an NPE).
  */
class GlobalRankGuardSpec extends SparkSpec {

  test("integral value columns narrower than LONG sum correctly (negatives included)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // negative ints are the trap: getLong on an int column reads the
    // zero upper word, so -3 would surface as 4294967293
    val df = Seq((1L, -3), (2L, 7), (3L, -1), (4L, 0), (5L, -8))
      .toDF("id", "v")
    val w = Window.orderBy($"id").rowsBetween(Window.unboundedPreceding, -1)
    val want = df
      .withColumn("cum", coalesce(sum($"v").over(w), lit(0L)))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cum")).toMap
    val got = graft.operators.GlobalRank
      .withPrefixSum(df, Seq($"id"), "v", "cum", partitions = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cum")).toMap
    assert(got === want)
    // keyed form, SHORT type
    val dfs = Seq((1L, "a", -2.toShort), (2L, "a", 5.toShort),
      (3L, "b", -7.toShort), (4L, "b", 1.toShort)).toDF("id", "k", "v")
    val wk = Window.partitionBy($"k").orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wantK = dfs.withColumn("cum", coalesce(sum($"v").over(wk), lit(0L)))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cum")).toMap
    val gotK = graft.operators.GlobalRank
      .withKeyedPrefixSum(dfs, Seq("k"), Seq($"id"), "v", "cum",
        partitions = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cum")).toMap
    assert(gotK === wantK)
  }

  test("non-integral value column is rejected at entry, not silently misread") {
    import spark.implicits._
    val df = Seq((1L, 1.5), (2L, 2.5)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      graft.operators.GlobalRank.withPrefixSum(df, Seq($"id"), "v")
    }
    assert(e.getMessage.contains("integral"))
    val ek = intercept[IllegalArgumentException] {
      graft.operators.GlobalRank
        .withKeyedPrefixSum(df.withColumn("k", lit("a")),
          Seq("k"), Seq($"id"), "v")
    }
    assert(ek.getMessage.contains("integral"))
  }

  test("double keys: -0.0 groups with 0.0 and NaNs group together (window parity)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, 0.0, 10L), (2L, -0.0, 20L), (3L, Double.NaN, 1L),
      (4L, Double.NaN, 2L), (5L, 1.5, 5L), (6L, -0.0, 3L))
      .toDF("id", "k", "v")
    val w = Window.partitionBy($"k").orderBy($"id")
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", coalesce(sum($"v")
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("rn"), r.getAs[Long]("cum")))
      .toMap
    for (parts <- Seq(1, 3)) {
      val got = graft.operators.GlobalRank
        .withKeyedRankAndPrefixSum(df, Seq("k"), Seq($"id"), "v",
          "rn", "cum", partitions = parts)
        .collect()
        .map(r => r.getLong(0) -> (r.getAs[Long]("rn"), r.getAs[Long]("cum")))
        .toMap
      assert(got === want, s"partitions=$parts")
    }
  }

  test("high-cardinality key fails in the executor before the driver collect") {
    import spark.implicits._
    val n = graft.operators.GlobalRank.MaxSegmentsPerPartition + 2
    val df = spark.range(n).select($"id", $"id".as("k"), lit(1L).as("v"))
    val e = intercept[org.apache.spark.SparkException] {
      graft.operators.GlobalRank
        .withKeyedPrefixSum(df, Seq("k"), Seq($"id"), "v", partitions = 1)
        .count()
    }
    assert(e.getMessage.contains("LOW-cardinality") ||
      Option(e.getCause).exists(_.getMessage.contains("LOW-cardinality")))
  }

  test("releaseCache unpersists the two-pass intermediates") {
    import spark.implicits._
    graft.operators.GlobalRank.releaseCache() // clean slate
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val df = Seq((1L, 2L), (2L, 3L)).toDF("id", "v")
    graft.operators.GlobalRank
      .withPrefixSum(df, Seq($"id"), "v").count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "operator should have persisted its sorted intermediate")
    graft.operators.GlobalRank.releaseCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "releaseCache should unregister every cached intermediate")
  }

  test("vector dim probe: empty input is a contract error, not an NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.ext.VectorIndex.hadamardRotate(empty, "embedding").collect()
    }
    assert(e.getMessage.contains("empty"))
    val nullFirst = Seq((0L, null: Array[Float]))
      .toDF("vec_id", "embedding")
    val en = intercept[IllegalArgumentException] {
      graft.ext.VectorIndex
        .pqTrain(nullFirst, "embedding", "vec_id", 2, 2, 1)
    }
    assert(en.getMessage.contains("null"))
  }
}
