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

  // ---- ellipsoidal (geodesic) parity path ----

  /** WGS-84 ellipsoid constants. */
  val WGS84a: Double = 6378137.0 // semi-major axis, m
  val WGS84f: Double = 1.0 / 298.257223563 // flattening
  val WGS84b: Double = WGS84a * (1 - WGS84f)

  /** Vincenty inverse distance in km on the WGS-84 ellipsoid — agrees
    * with geopy's Karney geodesic to sub-millimeter except near-antipodal
    * pairs (never at city scale). Iterative, so exposed as a Scala
    * function + UDF rather than a codegen expression; use it when
    * 3-decimal parity with reference-stored distances matters and
    * [[distanceKm]] (haversine, codegen'd, within the reference's own
    * test tolerance) otherwise. Returns NaN on non-convergence like
    * geopy raises→NaN in the reference (data_load_sqlite.py:103–111). */
  def vincentyKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    if (lat1 == lat2 && lon1 == lon2) return 0.0
    val L = math.toRadians(lon2 - lon1)
    val U1 = math.atan((1 - WGS84f) * math.tan(math.toRadians(lat1)))
    val U2 = math.atan((1 - WGS84f) * math.tan(math.toRadians(lat2)))
    val sinU1 = math.sin(U1); val cosU1 = math.cos(U1)
    val sinU2 = math.sin(U2); val cosU2 = math.cos(U2)

    var lambda = L
    var iter = 0
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cosSqAlpha = 0.0; var cos2SigmaM = 0.0
    var converged = false
    while (iter < 200 && !converged) {
      val sinLambda = math.sin(lambda); val cosLambda = math.cos(lambda)
      sinSigma = math.sqrt(
        math.pow(cosU2 * sinLambda, 2) +
          math.pow(cosU1 * sinU2 - sinU1 * cosU2 * cosLambda, 2))
      if (sinSigma == 0.0) return 0.0 // coincident
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLambda
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinLambda / sinSigma
      cosSqAlpha = 1 - sinAlpha * sinAlpha
      cos2SigmaM =
        if (cosSqAlpha == 0.0) 0.0
        else cosSigma - 2 * sinU1 * sinU2 / cosSqAlpha
      val C = WGS84f / 16 * cosSqAlpha * (4 + WGS84f * (4 - 3 * cosSqAlpha))
      val lambdaPrev = lambda
      lambda = L + (1 - C) * WGS84f * sinAlpha *
        (sigma + C * sinSigma *
          (cos2SigmaM + C * cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM)))
      if (math.abs(lambda - lambdaPrev) < 1e-12) converged = true
      iter += 1
    }
    if (!converged) return Double.NaN
    val uSq = cosSqAlpha * (WGS84a * WGS84a - WGS84b * WGS84b) / (WGS84b * WGS84b)
    val A = 1 + uSq / 16384 * (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val B = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    val deltaSigma = B * sinSigma *
      (cos2SigmaM + B / 4 *
        (cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM) -
          B / 6 * cos2SigmaM * (-3 + 4 * sinSigma * sinSigma) *
            (-3 + 4 * cos2SigmaM * cos2SigmaM)))
    WGS84b * A * (sigma - deltaSigma) / 1000.0
  }

  /** Static eval core for [[graft.plans.GeodesicKm]] (called from both
    * its interpreted and generated code): Vincenty distance rounded
    * half-even to 3 decimals like the reference's stored values
    * (data_load_sqlite.py:109, Python round = HALF_EVEN). NaN doubles as
    * the non-convergence sentinel — a distance is never legitimately NaN,
    * and the expression maps it to NULL. */
  def geodesicRoundedOrNaN(lat1: Double, lon1: Double,
      lat2: Double, lon2: Double): Double = {
    val d = vincentyKm(lat1, lon1, lat2, lon2)
    if (d.isNaN) Double.NaN
    else BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_EVEN).toDouble
  }

  /** Geodesic distance column — codegen'd native expression
    * ([[graft.plans.GeodesicKm]]), NULL-propagating. */
  def geodesicKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    graft.plans.GeoExpressions.geodesicKm(lat1, lon1, lat2, lon2)
}
