package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: assign consecutive per-key session ids,
  * starting a new session whenever the time since the previous event of
  * the same key exceeds `gapSec`. The batch analog of a streaming
  * session window (and the standard first step of clickstream / ride
  * "trip chaining" analysis — the reference's domain has exactly this
  * shape for per-bike rental chains).
  *
  * Plan: ONE shuffle (hash on the key for the window), then two
  * O(rows) window sweeps — `lag` to mark session starts, running `sum`
  * to number them. No self-join, no driver state; per-key memory during
  * the sweep is O(1). At 100 TB the shuffle partitions by key; salt
  * upstream if one key dominates (graft.functions.Skew).
  */
object Sessionize {

  /** Adds `session_id` (1-based per key) to `df`. Order within a key is
    * (tsCol, tieCols...) — pass a unique tiebreaker for determinism when
    * timestamps can collide. */
  def withSessionIds(df: DataFrame, keyCols: Seq[String], tsCol: String,
      gapSec: Long, tieCols: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    // cast-to-timestamp makes TIMESTAMP_NTZ inputs work too (no-op on
    // TIMESTAMP); the gap is a difference, so the tz interpretation of
    // the cast cancels out
    val micros = (c: org.apache.spark.sql.Column) =>
      unix_micros(c.cast("timestamp"))
    val isNew = when(
      prev.isNull ||
        micros(col(tsCol)) - micros(prev) > gapSec * 1000000L,
      1).otherwise(0)
    df.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-key session summary: session count, total events, and the
    * largest single session (two hash aggs after the window shuffle). */
  def sessionStats(df: DataFrame, keyCols: Seq[String], tsCol: String,
      gapSec: Long, tieCols: Seq[String] = Nil): DataFrame = {
    val perSession = withSessionIds(df, keyCols, tsCol, gapSec, tieCols)
      .groupBy((keyCols :+ "session_id").map(col): _*)
      .agg(count(lit(1)).as("n"))
    perSession
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n")).as("n_events"),
        max(col("n")).as("longest_session"))
  }
}
