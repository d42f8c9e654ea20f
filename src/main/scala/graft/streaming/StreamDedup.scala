package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming idempotent ingestion — the streaming analog of the
  * reference's INSERT-OR-IGNORE sink (K2, data_load_sqlite.py:218–235)
  * and of [[graft.store.IdempotentAppend]]: drop rows whose key was
  * already seen, with state BOUNDED by the event-time watermark (a
  * re-delivered event older than the horizon is assumed already
  * persisted upstream).
  *
  * At 100 TB/day the state store holds only keys inside the watermark
  * window, so memory is proportional to the dedup horizon, not the
  * stream's history — the only viable layout for an unbounded stream.
  */
object StreamDedup {

  /** Exactly-once-per-key stream within `watermark` of event time.
    * Works in both streaming and batch mode (batch = plain
    * dropDuplicates semantics over the whole input). */
  def dedup(df: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keys)
    else
      df.dropDuplicates(keys)
}
