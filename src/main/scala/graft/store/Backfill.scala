package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** K5/F8 — distance backfill (reference: src/backfill_distance.py).
  *
  * The reference UPDATEs rows where `distance IS NULL` and all four
  * coordinates are present. In the immutable-parquet model this is a
  * rewrite: `coalesce(distance, computed)` — no join, no driver loop,
  * one codegen'd pass (the reference iterates rows in Python).
  */
object Backfill {

  /** Rows that WOULD be updated (dry-run counting, reference :45–58). */
  def candidates(rides: DataFrame): DataFrame =
    rides.filter(
      col("distance").isNull &&
        col("lat_start").isNotNull && col("lon_start").isNotNull &&
        col("lat_end").isNotNull && col("lon_end").isNotNull)

  /** The rewrite: fill NULL distances where coordinates allow. */
  def apply(rides: DataFrame): DataFrame =
    rides.withColumn("distance",
      coalesce(col("distance"),
        Geo.distanceKm(col("lat_start"), col("lon_start"),
          col("lat_end"), col("lon_end"))))
}
