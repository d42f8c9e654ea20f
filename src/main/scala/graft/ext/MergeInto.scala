package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta-style MERGE (CDC apply) as one declarative full-outer join —
  * the snapshot-maintenance primitive for stores without a transactional
  * MERGE INTO. Semantics per key:
  *
  *   - change op = "D"        → row removed
  *   - change op = "U" or "I" → change's values win (upsert)
  *   - no change row          → base row carried unchanged
  *
  * One shuffle on the key (the full-outer join); at 100 TB both sides
  * hash-partition on the key, and when the base table is bucketed on it
  * ([[graft.store.BucketedStore]]) the base side doesn't shuffle at all.
  * Mirrors the reference's in-place UPDATE sink (SURVEY §2.1 K5,
  * backfill_distance.py:79-84) generalized to insert/update/delete.
  */
object MergeInto {

  /** Apply `changes` (key + `opCol` ∈ {I,U,D} + payload columns matching
    * `base`'s) to `base`. Payload = every non-key column of `base`;
    * `changes` must carry the same payload columns. */
  def apply(base: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    val payload = base.columns.filterNot(_ == key).toSeq
    val b = base.select(col(key) +: payload.map(c => col(c).as(s"__b_$c")): _*)
    val ch = changes.select(
      col(key) +: col(opCol).as("__op") +: payload.map(c => col(c).as(s"__c_$c")): _*)
    b.join(ch, Seq(key), "full_outer")
      .filter(coalesce(col("__op"), lit("")) =!= "D")
      .select(col(key) +: payload.map { c =>
        when(col("__op").isNotNull, col(s"__c_$c"))
          .otherwise(col(s"__b_$c")).as(c)
      }: _*)
  }
}
