package graft

import org.apache.spark.sql.functions._

import graft.queries.Extended20

/** Round-12 batch: the OPQ rotation rung. q201 is DuckDB-oracle-gated;
  * these pin the rotation operator's algebraic contract (orthonormal ⇒
  * isometry) that the recall read-out depends on.
  */
class Extended20Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("hadamardRotate is an isometry: norms and pairwise dots preserved") {
    import spark.implicits._
    val e = graft.queries.Tables.load(spark, dir, "embeddings")
    val rot = graft.ext.VectorIndex.hadamardRotate(e, "embedding", "rvec")
    // rvec is array<double>; the native l2Norm is float-only, so the
    // rotated norm uses a double HOF (exactness is not at stake here —
    // the assertion is a 1e-9 drift bound, not bit parity)
    def dnorm(c: org.apache.spark.sql.Column) =
      sqrt(aggregate(c, lit(0.0), (acc, x) => acc + x.cast("double") * x))
    val drift = rot.select(
        abs(dnorm($"rvec") - dnorm($"embedding")).as("d"))
      .agg(max($"d")).head().getDouble(0)
    assert(drift < 1e-9, s"rotation changed norms by $drift")
    // pairwise dot (hence cosine, hence brute top-k) preserved — the
    // property that makes the rotated rung comparable to the raw one
    val a = rot.select($"vec_id".as("ia"), $"embedding".as("va"),
      $"rvec".as("ra")).filter($"ia" < 8)
    val b = rot.select($"vec_id".as("ib"), $"embedding".as("vb"),
      $"rvec".as("rb")).filter($"ib" < 8)
    val dotDrift = a.crossJoin(b).filter($"ia" < $"ib")
      .select(abs(
        graft.functions.VectorFns.dot($"va", $"vb").cast("double") -
          aggregate(zip_with($"ra", $"rb", (x, y) => x * y),
            lit(0.0), (acc, x) => acc + x)).as("d"))
      .agg(max($"d")).head().getDouble(0)
    assert(dotDrift < 1e-9, s"rotation changed pairwise dots by $dotDrift")
  }

  test("hadamardRotate: deterministic across runs; rejects non-power-of-2 dims") {
    import spark.implicits._
    val e = graft.queries.Tables.load(spark, dir, "embeddings").limit(20)
    val r1 = graft.ext.VectorIndex.hadamardRotate(e, "embedding")
      .select($"vec_id", $"rvec").collect().map(r =>
        r.getLong(0) -> r.getSeq[Double](1)).toMap
    val r2 = graft.ext.VectorIndex.hadamardRotate(e, "embedding")
      .select($"vec_id", $"rvec").collect().map(r =>
        r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(r1 === r2, "rotation not bit-deterministic")
    val bad = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "v")
    val ex = intercept[IllegalArgumentException] {
      graft.ext.VectorIndex.hadamardRotate(bad, "v")
    }
    assert(ex.getMessage.contains("power-of-2"))
  }

  test("q201: two priced rungs, recall arithmetic consistent") {
    import spark.implicits._
    val got = Extended20.q201(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq("opq_pq", "pq_flat"))
    got.foreach { case (m, n, ppm) =>
      assert(n >= 0L && n <= 10L, s"$m n_common=$n")
      assert(ppm === n * 1000000L / 10L, s"$m recall_ppm inconsistent")
    }
  }
}
