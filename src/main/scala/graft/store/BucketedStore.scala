package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed managed tables for shuffle-free co-located key joins.
  *
  * Date partitioning (RidesTable) prunes scans; BUCKETING removes the
  * exchange from repeated key joins entirely: a table written with
  * `bucketBy(n, key)` is already hash-distributed on the key, so joins
  * and aggregations on it skip the shuffle (SortMergeJoin reads the
  * bucketed layout directly). At 100 TB this is the difference between
  * re-shuffling the fact table on every idempotent-append anti-join and
  * reading only matching buckets.
  *
  * Uses the session catalog (in-memory or Hive) because bucketing
  * metadata lives in the catalog, not in parquet files.
  */
object BucketedStore {

  /** Create-or-append `df` as a managed bucketed table. */
  def append(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Append)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Idempotent append into a bucketed table: the anti-join probes the
    * bucketed layout — no exchange on the existing side. */
  def idempotentAppend(spark: SparkSession, incoming: DataFrame,
      table: String, key: String, numBuckets: Int = 32): Long = {
    val deduped = incoming.dropDuplicates(key)
    val delta =
      if (!spark.catalog.tableExists(table)) deduped
      else deduped.join(spark.table(table).select(key), Seq(key), "left_anti")
    val n = delta.count()
    if (n > 0) append(delta, table, key, numBuckets)
    n
  }
}
