package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream joins — the remaining Structured Streaming operator
  * class next to windows (EventWindows), stateful diff
  * (StatefulStatusStream), and dedup (StreamDedup).
  *
  * The canonical shape: two event streams joined per key within a time
  * interval, with watermarks on BOTH sides so the join state store only
  * holds rows inside the horizon — the layout that keeps state bounded
  * at any stream volume. Left-outer emission of unmatched rows happens
  * when the watermark passes their horizon (correct, late, and bounded
  * — the streaming trade-off).
  *
  * The same definition executes as a plain interval join on batch
  * DataFrames (Spark unifies the semantics), so the operator is
  * testable both ways.
  */
object StreamJoins {

  /** Purchase↔click attribution within `horizonSec` seconds: every left
    * event joined to same-key right events with
    * rightTime in [leftTime - horizon, leftTime].
    *
    * Column contract: `left` has (key, leftTime, ...), `right` has
    * (rightKey, rightTime, ...) with DISTINCT column names (rename
    * before calling — stream-stream joins need unambiguous sides). */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      horizonSec: Long, joinType: String = "leftOuter"): DataFrame = {
    val l = if (left.isStreaming)
      left.withWatermark(leftTime, s"$horizonSec seconds") else left
    val r = if (right.isStreaming)
      right.withWatermark(rightTime, s"$horizonSec seconds") else right
    l.join(r,
      expr(s"""$leftKey = $rightKey
              | AND $rightTime >= $leftTime - INTERVAL $horizonSec SECONDS
              | AND $rightTime <= $leftTime""".stripMargin),
      joinType)
  }

  /** Stream-static enrichment join: a streaming fact joined to a bounded
    * dimension table. No watermark and NO join state store — each
    * micro-batch hash-joins against the static side, which Spark
    * broadcasts when small (dimension tables always are). This is the
    * zero-state streaming join; use [[intervalJoin]] only when BOTH
    * sides actually stream. The static side is re-read per batch for
    * file sources, so dimension updates are picked up between batches. */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String,
      joinType: String = "left"): DataFrame =
    stream.join(
      org.apache.spark.sql.functions.broadcast(dim),
      stream(streamKey) === dim(dimKey), joinType)
}
