package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: K-Minimum-Values distinct sketch (Bar-Yossef et al. 2002)
  * over a pre-hashed string column — the bounded, MERGEABLE summary that
  * replaces an exact `collect_set` for distinct-cardinality and
  * set-overlap estimation.
  *
  * The input is expected to already be a uniform hash rendering of the
  * element (this engine feeds md5 hex strings, the cross-engine-stable
  * hash every oracle can reproduce); the sketch keeps the k
  * lexicographically SMALLEST distinct hashes. Because "k smallest of a
  * set" is a semilattice, partial (map-side) sketches merge losslessly:
  * merge = k smallest of the union — so shuffle volume is O(groups × k)
  * regardless of element count, the same scale argument as [[TopKLong]].
  *
  * What the k-smallest sample buys downstream (see q213): for two
  * sketches A, B with threshold t = k-th smallest of A ∪ B, the members
  * of A ∪ B below t are a uniform size-k sample of the union, so
  * |{h < t : h ∈ A ∧ h ∈ B}| / k is an unbiased Jaccard estimator
  * (Beyer et al., SIGMOD 2007) — computed here entirely on strings and
  * integers, no floating point to diverge cross-engine.
  *
  * Duplicates are absorbed by the buffer (distinct-insert), so callers
  * need NOT pre-deduplicate; reduce is O(k) per row with an early exit
  * for values above the current k-th minimum (the common case once the
  * buffer saturates: a saturated sketch rejects all but ~k/n of inputs).
  */
case class KmvSketch(k: Int) extends Aggregator[String, Seq[String], Seq[String]] {
  require(k >= 1, "k must be >= 1")

  override def zero: Seq[String] = Seq.empty

  override def reduce(b: Seq[String], a: String): Seq[String] =
    if (a == null) b
    else if (b.length >= k && a >= b.last) b // can't enter a full sketch
    else if (b.contains(a)) b                // distinct semantics
    else ((b :+ a).sorted).take(k)

  override def merge(a: Seq[String], b: Seq[String]): Seq[String] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(r: Seq[String]): Seq[String] = r

  override def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}
