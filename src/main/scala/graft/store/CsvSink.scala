package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode}

/** K1 — interim cleaned-CSV sink (reference: src/bike_rides_cli.py:44–46,
  * src/data_load_sqlite.py:272–275: `df.to_csv(data/interim/<name>_clean
  * .csv, index=False)`).
  *
  * Distributed write: header per part-file, overwrite mode. The reference
  * writes one file; `coalesce(1)` reproduces that for small daily batches
  * — leave partitioned at scale (the interim CSV is a debugging artifact,
  * not a system-of-record).
  */
object CsvSink {

  def writeInterim(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }
}
