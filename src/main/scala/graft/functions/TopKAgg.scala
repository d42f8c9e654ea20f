package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (`Aggregator[IN, BUF, OUT]`): exact top-k largest values
  * per group, as a bounded-buffer aggregate.
  *
  * This is the UDAF rung of the extension ladder (the reference needs no
  * custom aggregate — SURVEY.md §2.9 — so this is extension surface):
  * unlike the window-rank formulation (`row_number <= k` after a
  * per-group SORT of all rows), the aggregate carries at most k values
  * per group through BOTH the partial (map-side) and final (reduce-side)
  * phases — shuffle volume is O(groups × k), not O(rows), which is the
  * difference between a broadcast-sized result and a full re-sort at
  * 100 TB.
  *
  * Buffer is a descending-sorted Seq capped at k; `reduce` is O(k) per
  * row (early-exit when the value can't enter), `merge` is a bounded
  * merge of two sorted lists. Duplicate values are kept (multiset
  * semantics — same as `ORDER BY v DESC LIMIT k` on values alone).
  */
case class TopKLong(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 1, "k must be >= 1")

  override def zero: Seq[Long] = Seq.empty

  override def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.length < k) (b :+ a).sortBy(x => -x)
    else if (a > b.last) (b.init :+ a).sortBy(x => -x)
    else b

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).sortBy(x => -x).take(k)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
