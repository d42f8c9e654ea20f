package graft

import org.apache.spark.sql.functions._

import graft.store.BucketedStore

/** Bucketed-table layout: joins on the bucket key must not exchange the
  * bucketed side. */
class BucketedStoreSpec extends SparkSpec {

  test("join of two co-bucketed tables runs with ZERO exchanges") {
    import spark.implicits._
    val tA = "bucketed_rides_a"
    val tB = "bucketed_rides_b"
    spark.sql(s"DROP TABLE IF EXISTS $tA")
    spark.sql(s"DROP TABLE IF EXISTS $tB")
    BucketedStore.append(
      spark.range(10000).select($"id".as("uid"), ($"id" % 97).as("v")),
      tA, "uid", numBuckets = 8)
    BucketedStore.append(
      spark.range(5000).select($"id".as("uid"), ($"id" % 13).as("w")),
      tB, "uid", numBuckets = 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the bucketed layout is load-bearing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedStore.read(spark, tA)
        .join(BucketedStore.read(spark, tB), "uid")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle:\n$plan")
      assert(joined.count() === 5000)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("idempotentAppend into bucketed table dedups across loads") {
    import spark.implicits._
    val table = "bucketed_idem_test"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val a = Seq((1L, "x"), (2L, "y")).toDF("uid", "v")
    val b = Seq((2L, "y"), (3L, "z")).toDF("uid", "v")
    assert(BucketedStore.idempotentAppend(spark, a, table, "uid", 4) === 2)
    assert(BucketedStore.idempotentAppend(spark, b, table, "uid", 4) === 1)
    assert(BucketedStore.read(spark, table).count() === 3)
  }

  test("registerAll exposes the SQL surface") {
    graft.queries.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      "SELECT count(*) FROM lineitem WHERE l_quantity > 2").head().getLong(0)
    assert(n > 0)
    val joined = spark.sql(
      """SELECT c_mktsegment, count(*) AS n FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(joined.count() === 5)
  }
}
