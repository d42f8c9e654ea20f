package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: merge an EXISTING per-key rollup
  * with the rollup of a NEW batch, without touching historical fact
  * rows — the distributed version of the reference's nightly
  * compute-metrics cron (compute_daily_metrics.py:281-293 merges one
  * day into the yearly JSON; here the merge itself is a Spark plan).
  *
  * Algebra: only decomposable aggregates participate — (count, sum,
  * min, max) merge exactly; avg is derived sum/count at read time.
  * `mergeDaily(existing, delta)` is a full-outer union-agg: cost is
  * O(|existing keys| + |delta|), independent of total history size —
  * the difference between a nightly job that reads one day and one
  * that rescans 100 TB.
  *
  * Contract (spec-enforced): merge(agg(A), agg(B)) == agg(A ∪ B), and
  * the merge is idempotent-safe when the caller dedups batch ids first
  * (pair with store.IdempotentAppend, which already anti-joins on uid).
  */
object IncrementalAgg {

  /** Per-key decomposable rollup of a fact frame: count/sum/min/max of
    * `valueCol` grouped by `keyCols`. */
  def rollup(facts: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame =
    facts.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol)).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Merge two rollups with the same schema into one (re-aggregate the
    * union on the mergeable components). Keys present in either side
    * survive; overlapping keys combine exactly. */
  def merge(existing: DataFrame, delta: DataFrame,
      keyCols: Seq[String]): DataFrame =
    existing.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Read-side derivation: add avg to a rollup (never stored — derived
    * so merges stay exact). */
  def withAvg(rollup: DataFrame): DataFrame =
    rollup.withColumn("avg_v", col("sum_v") / col("n"))
}
