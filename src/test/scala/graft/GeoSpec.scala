package graft

import org.apache.spark.sql.functions._

import graft.functions.Geo

/** Distance functions: haversine (codegen) and Vincenty (geodesic
  * parity). Ground truths: the reference's own 0.546 km golden
  * (tests/test_data_load_sqlite.py:115–127) and published WGS-84
  * geodesic distances. */
class GeoSpec extends SparkSpec {

  test("vincenty matches known WGS-84 geodesic distances") {
    // Flinders Peak → Buninyong (the classic Vincenty test pair):
    // 54972.271 m (Geoscience Australia / Vincenty 1975 paper)
    val d1 = Geo.vincentyKm(
      -(37 + 57 / 60.0 + 3.72030 / 3600), 144 + 25 / 60.0 + 29.52440 / 3600,
      -(37 + 39 / 60.0 + 10.15610 / 3600), 143 + 55 / 60.0 + 35.38390 / 3600)
    assert(math.abs(d1 * 1000 - 54972.271) < 0.01, s"got ${d1 * 1000} m")
    // equator quarter-turn along the equator: exactly a*pi/2
    val d2 = Geo.vincentyKm(0, 0, 0, 90)
    assert(math.abs(d2 * 1000 - Geo.WGS84a * math.Pi / 2) < 0.001)
    // degenerate: same point
    assert(Geo.vincentyKm(51.1, 17.0, 51.1, 17.0) === 0.0)
  }

  test("vincenty vs haversine divergence is ~0.1-0.5% at city scale") {
    val v = Geo.vincentyKm(51.109782, 17.030175, 51.113871, 17.034484)
    assert(math.abs(v - 0.546) < 0.005, s"reference golden, got $v")
    val df = spark.range(1).select(
      Geo.haversineKm(lit(51.109782), lit(17.030175),
        lit(51.113871), lit(17.034484)).as("h"))
    val h = df.head().getDouble(0)
    assert(math.abs(v - h) / v < 0.01, s"vincenty $v vs haversine $h")
  }

  test("haversine stays inside whole-stage codegen") {
    val df = graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(Geo.distanceKm(
        lit(51.0), lit(17.0),
        org.apache.spark.sql.functions.col("l_quantity"),
        org.apache.spark.sql.functions.col("l_discount")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"haversine fell out of codegen:\n$plan")
  }

  test("geodesicKm stays inside whole-stage codegen (native expression, not a UDF)") {
    val df = graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(Geo.geodesicKm(
        lit(51.0), lit(17.0),
        org.apache.spark.sql.functions.col("l_quantity"),
        org.apache.spark.sql.functions.col("l_discount")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"geodesic fell out of codegen:\n$plan")
  }

  test("geodesicKm column: null propagation and rounding") {
    import spark.implicits._
    val df = Seq(
      (Some(51.109782), Some(17.030175), Some(51.113871), Some(17.034484)),
      (None, Some(17.0), Some(51.0), Some(17.0))
    ).toDF("a", "b", "c", "d")
    val out = df.select(Geo.geodesicKm($"a", $"b", $"c", $"d").as("km")).collect()
    val v = out(0).getDouble(0)
    assert(v === BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
    assert(out(1).isNullAt(0))
  }
}
