package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** S2 — station dimension scan + sanitize (reference:
  * src/data_load_sqlite.py:115–124).
  *
  *  - drop embedded duplicate header rows (`station_name,lat,lon` lines
  *    inside the file force string dtypes in pandas);
  *  - coerce lat/lon to double with coerce-to-null (`errors='coerce'`).
  *
  * 478 rows — always a broadcast dimension downstream.
  */
object StationCsv {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("encoding", "UTF-8")
      .schema(Schemas.rawStationSchema)
      .csv(path)
      .filter(lower(col("station_name")) =!= "station_name" || col("station_name").isNull)
      .select(
        col("station_name"),
        expr("try_cast(lat AS DOUBLE)").as("lat"),
        expr("try_cast(lon AS DOUBLE)").as("lon")
      )
}
