package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** K2 — the idempotent, date-partitioned rides store (reference:
  * src/data_load_sqlite.py:190–235 `create_database`/`load_to_sqlite`).
  *
  * The reference's staging table + `INSERT OR IGNORE` on UNIQUE(uid)
  * becomes: dedup the batch on uid, anti-join against the existing
  * table's uids, append as parquet partitioned by `ride_date`.
  *
  * Scale design:
  *  - `partitionBy(ride_date)` replaces the missing SQLite date index —
  *    single-day metrics and backfills prune to one partition;
  *  - the anti-join probe restricts `existing` to the date range the
  *    incoming batch spans (daily exports overlap only a few days), so
  *    the dedup scan is a handful of partitions, not 100 TB;
  *  - only (uid) is projected from the existing side — column pruning
  *    keeps the probe narrow.
  * Single-writer assumption, as in the reference.
  */
object RidesTable {

  /** Append `batch` (RideTransform output) idempotently. Returns rows
    * actually written. */
  def append(spark: SparkSession, batch: DataFrame, path: String): Long = {
    val withDate = batch.withColumn("ride_date", to_date(col("start_time")))
    val deduped = withDate.dropDuplicates("uid")

    val delta =
      if (!exists(spark, path)) deduped
      else {
        val bounds = withDate.agg(
          min(col("ride_date")).as("lo"), max(col("ride_date")).as("hi")).head()
        val existing = spark.read.parquet(path)
        val pruned =
          if (bounds.isNullAt(0)) existing
          else existing.filter(
            col("ride_date").between(bounds.getDate(0), bounds.getDate(1)) ||
              col("ride_date").isNull)
        deduped.join(pruned.select("uid"), Seq("uid"), "left_anti")
      }

    val n = delta.count()
    if (n > 0)
      delta.write.mode(SaveMode.Append).partitionBy("ride_date").parquet(path)
    n
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Typed edge: the fact table as Dataset[Ride] (for consumers that
    * want compile-time column safety; the DataFrame path stays the
    * default — Catalyst sees through both identically). */
  def readTyped(spark: SparkSession, path: String): org.apache.spark.sql.Dataset[graft.model.Ride] = {
    import spark.implicits._
    spark.read.parquet(path)
      .drop("ride_date") // partition column, not part of the Ride schema
      .as[graft.model.Ride]
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}
