package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic content-hash dataset splitting (train/val/test) — the
  * assignment every training-data pipeline needs to be STABLE: the same
  * row lands in the same split regardless of cluster size, partitioning,
  * engine, or run (unlike `rand()` or Spark's `hash()`, which other
  * engines can't reproduce). md5 of the id is the portable choice: every
  * SQL engine computes the identical digest.
  *
  * Purely scalar (codegen'd, no shuffle); at 100 TB the split column is
  * computed scan-side and can feed a partitioned write so each split is
  * its own file set.
  */
object HashSplit {

  /** Bucket in [0, modulus) from the first eight hex chars of md5(id) —
    * 2^32 source values, so the residual pmod bias is at most
    * modulus/2^32 (~2e-9 for a 10-way split; two hex chars = 256 values
    * would skew an 8/1/1 split by ~0.4%). */
  def bucket(idCol: Column, modulus: Int): Column =
    pmod(conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(modulus.toLong)).cast("int")

  /** Split assignment by integer weights, e.g.
    * `assign($"doc_id", Seq("train" -> 8, "val" -> 1, "test" -> 1))`:
    * buckets 0-7 -> train, 8 -> val, 9 -> test. */
  def assign(idCol: Column, splits: Seq[(String, Int)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive weights")
    val total = splits.map(_._2).sum
    val b = bucket(idCol, total)
    val (_, expr) = splits.foldLeft((0, lit(null).cast("string"))) {
      case ((offset, acc), (name, weight)) =>
        val hi = offset + weight
        (hi, when(b >= offset && b < hi, lit(name)).otherwise(acc))
    }
    expr
  }

  /** Rendezvous (highest-random-weight, Thaler & Ravishankar 1998)
    * shard assignment: each (id, shard) pair gets an independent hash
    * weight (first 15 md5 hex chars of "id:shard" — 60 bits, same
    * portable digest as [[bucket]]) and the row goes to the argmax
    * shard, ties toward the larger shard index.
    *
    * What it buys over `bucket(id, n)`: STABILITY under fleet resizes —
    * growing n → n+1 moves exactly the rows the new shard wins
    * (~1/(n+1) of them, the provable minimum), where mod-hash moves
    * ~n/(n+1). Still purely scalar and codegen'd: n md5 calls per row,
    * no shuffle — so it suits moderate shard counts (a fan-out of
    * hundreds, not millions; the per-row cost is linear in n). */
  def hrwShard(idCol: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 4096,
      s"nShards must be in [1, 4096], got $nShards (per-row cost is linear in it)")
    val scores = (0 until nShards).map { sh =>
      struct(conv(substring(md5(concat(idCol.cast("string"), lit(s":$sh"))),
        1, 15), 16, 10).cast("long").as("w"),
        lit(sh).as("s"))
    }
    array_max(array(scores: _*)).getField("s")
  }
}
