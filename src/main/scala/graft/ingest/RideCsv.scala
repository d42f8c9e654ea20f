package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Schemas

/** S1 — raw ride CSV scan (reference: src/data_load_sqlite.py:266,
  * src/bike_rides_cli.py:41 `pd.read_csv`).
  *
  * Explicit all-string schema: the reference reads with inferred dtypes
  * then coerces with errors='coerce'; we read strings and coerce in
  * [[graft.transform.RideTransform]] so malformed values become NULL,
  * never errors — independent of the session's ANSI mode.
  *
  * Scale: one file per day in the reference; at 100 TB this is a
  * directory glob and Spark parallelizes the scan per file split.
  */
object RideCsv {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("encoding", "UTF-8")
      .schema(Schemas.rawRideSchema)
      .csv(path)
}
