package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic/haversine distance as pure Column expressions.
  *
  * The reference computes ride distance row-wise in Python with geopy's
  * WGS-84 geodesic (reference: src/data_load_sqlite.py:100–111 and
  * src/backfill_distance.py:21–30). Its own tests accept haversine within
  * 0.01 km (reference: tests/test_data_load_sqlite.py:99–112), so the
  * primary implementation here is haversine built from Spark's codegen'd
  * math functions — no UDF, stays inside whole-stage codegen, NULL
  * coordinates propagate to NULL distance exactly like the reference's
  * NaN propagation.
  */
object Geo {

  /** Mean Earth radius in km (IUGG); same constant class geopy uses for
    * great-circle math. */
  val EarthRadiusKm: Double = 6371.0088

  /** Great-circle (haversine) distance in km between two WGS-84 points.
    * Pure built-in functions => whole-stage codegen, NULL-propagating.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2) - radians(lat1)
    val dLon = radians(lon2) - radians(lon1)
    val a =
      pow(sin(dLat / 2), 2) +
        cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Haversine rounded half-even to 3 decimals, the reference's storage
    * precision (reference: src/data_load_sqlite.py:109 uses Python round,
    * which is HALF_EVEN => Spark `bround`). */
  def distanceKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    bround(haversineKm(lat1, lon1, lat2, lon2), 3)
}
