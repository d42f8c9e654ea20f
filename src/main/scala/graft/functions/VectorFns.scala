package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Column
  * expressions (`zip_with` + `aggregate` higher-order functions).
  *
  * No UDFs: these stay in Tungsten and scale linearly with rows. At
  * 100 TB the embeddings table is distributed; brute-force top-k is a
  * single map + partial top-k + final top-k (TakeOrderedAndProject),
  * and the LSH path buckets first so the candidate join is local per
  * bucket.
  */
object VectorFns {

  /** Dot product of two float-array columns, accumulated in double.
    * Delegates to the native codegen'd expression
    * ([[graft.plans.FloatVectorDot]]) — a tight Java loop inside
    * whole-stage codegen instead of interpreted per-element lambdas. */
  def dot(a: Column, b: Column): Column = graft.plans.VectorExpressions.dot(a, b)

  /** Reference implementation via higher-order functions (kept for
    * cross-checking the native expression in tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NULL when either norm is 0. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Sign-bit LSH bucket id from the first `bits` vector components:
    * bit i set iff component i >= 0. Axis-aligned random-hyperplane LSH
    * (components of a trained embedding are near-random directions);
    * deterministic and reproducible in any engine. Vectors in the same
    * bucket are cosine-close candidates. */
  def signBucket(a: Column, bits: Int): Column =
    // bits = 0 is a legitimate value of the occupancy-derived dial
    // (VectorIndex.occupancySubBits on a small corpus): one bucket
    if (bits == 0) lit(0L)
    else (0 until bits)
      .map(i => when(element_at(a, i + 1) >= 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** [[signBucket]] over components [offset, offset+bits) — the band
    * slice for banded sign-LSH (band j reads offset = j·bits, so bands
    * are disjoint hyperplane sets). `signBucketAt(a, 0, bits)` is
    * exactly `signBucket(a, bits)`. */
  def signBucketAt(a: Column, offset: Int, bits: Int): Column =
    (0 until bits)
      .map(i => when(element_at(a, offset + i + 1) >= 0, lit(1L << i))
        .otherwise(lit(0L)))
      .reduce(_ + _)

  /** Hamming distance between two [[signBucket]]-packed sign codes:
    * one XOR + one popcount per comparison, both codegen'd integer
    * ops — the binary-quantization distance (a full 64-dim code is 8
    * bytes/vector, so the BQ scan reads 32× less than float32
    * vectors and does 64 bit-ops where cosine does 64 FMAs). */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
