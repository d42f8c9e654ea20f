package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities: salting for hot keys.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles most runtime skew; these helpers cover the cases AQE
  * can't re-plan:
  *  - [[saltedJoin]] — a shuffle join where one key dominates (a
  *    "null-island" station, a viral document): the skewed side gets a
  *    deterministic salt in [0, n), the small side is replicated n times,
  *    and the join key becomes (key, salt) — the hot key spreads over n
  *    reducers.
  *  - [[saltedAgg]] — two-stage aggregation for aggregates whose partial
  *    state does NOT shrink (collect_list/collect_set): stage 1 groups by
  *    (key, salt), stage 2 merges the n partials per key. For
  *    sum/count/min/max Spark's partial aggregation already does this —
  *    use these helpers only for holistic aggregates.
  *
  * Salts are deterministic (hash of a chosen column, or a round-robin on
  * a monotonic id) so reruns and resumed stages agree.
  */
object Skew {

  /** Deterministic salt in [0, n) derived from arbitrary columns. */
  def salt(n: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(n))

  /** Equi-join `big` (skewed) with `small` on `key`, spreading each key
    * over `n` salt buckets. Inner/left semantics follow `joinType`.
    * `small` is replicated n× — keep it broadcast-sized. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      n: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      salt(n, big.columns.map(col).toIndexedSeq: _*))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(n - 1))))
    saltedBig
      .join(replicated, Seq(key, "_salt"), joinType)
      .drop("_salt")
  }

  /** Two-stage collect_list-style aggregation: stage 1 collects per
    * (key, salt); stage 2 flattens the n partial lists per key. */
  def saltedCollectList(df: DataFrame, key: String, valueCol: String,
      n: Int): DataFrame =
    df.withColumn("_salt", salt(n, col(valueCol)))
      .groupBy(col(key), col("_salt"))
      .agg(collect_list(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(flatten(collect_list(col("_partial"))).as(s"${valueCol}_list"))
}
