package graft

import org.apache.spark.sql.functions._

/** The sketch-based scale path next to the exact operators: HLL distinct
  * counts (vs q48's exact distincts) and approximate percentiles (vs
  * q41's exact interpolation). At 100 TB the exact forms shuffle every
  * distinct value / sort every group; the sketches are fixed-size and
  * mergeable, so they partial-aggregate map-side. These tests pin the
  * accuracy contract that makes the swap safe. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events =
    graft.queries.Tables.load(spark, "/root/testdata/sf0.01", "events")

  test("approx_count_distinct within its rsd bound of the exact count") {
    val r = events.agg(
      countDistinct($"user_id").as("exact"),
      approx_count_distinct($"user_id", rsd = 0.05).as("approx")
    ).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact drifts past 3x rsd")
  }

  test("approx HLL composes with groupBy like the exact form (q48 shape)") {
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = events.groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", rsd = 0.02).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.1, s"group $k")
    }
  }

  test("percentile_approx brackets the exact percentile (q41 shape)") {
    val r = events
      .select($"event_type", floor($"value").cast("int").as("iv"))
      .groupBy($"event_type")
      .agg(
        expr("percentile(iv, 0.5)").as("exact"),
        expr("percentile_approx(iv, 0.5, 10000)").as("approx"),
        min($"iv").as("lo"), max($"iv").as("hi"))
      .collect()
    r.foreach { row =>
      val exact = row.getDouble(1)
      val approx = row.getInt(2).toDouble
      val span = row.getInt(4) - row.getInt(3)
      assert(math.abs(approx - exact) <= math.max(1.0, span * 0.05),
        s"${row.getString(0)}: approx=$approx exact=$exact")
    }
  }
}
