package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** The ride-cleaning transform — P1–P4, F1, J1–J2, C1 (reference:
  * src/data_load_sqlite.py:114–187 `transform_data`).
  *
  * Pipeline (one lazy DataFrame chain; Catalyst pushes the '#' filter and
  * column pruning into the CSV scan):
  *  1. station-name cleanup: strip NBSP, rstrip, literal 'nan' → NULL
  *     (:125–130);
  *  2. drop rows where either station starts with '#' — NULL stations are
  *     KEPT, matching pandas startswith(na=False) (:132–135);
  *  3. two broadcast left joins against the station dimension for
  *     start/end coordinates (:138–139) — 478 rows ⇒ broadcast-hash, so
  *     100 TB of rides never shuffles;
  *  4. Polish→English rename + coerce-to-null typing (:146–177);
  *  5. geodesic distance, 3 decimals, NULL-propagating (:178, :100–111 —
  *     the reference's row-wise geopy apply becomes a codegen'd native
  *     expression, [[graft.plans.GeodesicKm]]);
  *  6. canonical column order (:181–187).
  */
object RideTransform {

  private def cleanStation(c: org.apache.spark.sql.Column) = {
    val stripped = rtrim(regexp_replace(c, "\u00a0", ""))
    when(stripped === "nan", lit(null)).otherwise(stripped)
  }

  /** @param raw         output of [[graft.ingest.RideCsv.read]]
    * @param stations    output of [[graft.ingest.StationCsv.read]]
    * @param useGeodesic true (default) ⇒ WGS-84 Vincenty distances
    *                    ([[Geo.geodesicKm]], a codegen'd native
    *                    expression — 3-dp-exact parity with the
    *                    reference's geopy-stored values,
    *                    data_load_sqlite.py:109); false ⇒ haversine
    *                    ([[Geo.distanceKm]]), within the reference's own
    *                    test tolerance (test_data_load_sqlite.py:99–112)
    *                    and expressible in any engine (the oracle mode). */
  def apply(raw: DataFrame, stations: DataFrame,
      useGeodesic: Boolean = true): DataFrame = {
    val cleaned = raw
      .withColumn("Stacja wynajmu", cleanStation(col("Stacja wynajmu")))
      .withColumn("Stacja zwrotu", cleanStation(col("Stacja zwrotu")))
      // F1 — null-safe '#' filter: NULL stations are kept
      .filter(
        !coalesce(col("Stacja wynajmu").startsWith("#"), lit(false)) &&
          !coalesce(col("Stacja zwrotu").startsWith("#"), lit(false))
      )

    val startDim = broadcast(stations
      .select(col("station_name").as("_sn_start"),
        col("lat").as("lat_start"), col("lon").as("lon_start")))
    val endDim = broadcast(stations
      .select(col("station_name").as("_sn_end"),
        col("lat").as("lat_end"), col("lon").as("lon_end")))

    cleaned
      .join(startDim, col("Stacja wynajmu") === col("_sn_start"), "left")
      .join(endDim, col("Stacja zwrotu") === col("_sn_end"), "left")
      .select(
        expr("try_cast(`UID wynajmu` AS BIGINT)").as("uid"),
        col("Numer roweru").as("bike_number"),
        expr("try_to_timestamp(`Data wynajmu`)").as("start_time"),
        expr("try_to_timestamp(`Data zwrotu`)").as("end_time"),
        col("Stacja wynajmu").as("start_station"),
        col("Stacja zwrotu").as("end_station"),
        expr("try_cast(`Czas trwania` AS INT)").as("duration"),
        col("lat_start"), col("lon_start"), col("lat_end"), col("lon_end"),
        (if (useGeodesic)
          Geo.geodesicKm(col("lat_start"), col("lon_start"),
            col("lat_end"), col("lon_end"))
        else
          Geo.distanceKm(col("lat_start"), col("lon_start"),
            col("lat_end"), col("lon_end"))).as("distance")
      )
  }
}
