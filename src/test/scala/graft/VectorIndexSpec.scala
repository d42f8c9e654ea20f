package graft

import org.apache.spark.sql.functions._

import graft.ext.VectorIndex
import graft.functions.VectorFns

/** IVF index: determinism, cell coverage, recall vs brute force. */
class VectorIndexSpec extends SparkSpec {

  private lazy val emb =
    graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "embeddings").cache()

  test("training is deterministic and assignment covers every row") {
    val c1 = VectorIndex.trainCentroids(emb, "embedding", k = 8, iterations = 3)
    val c2 = VectorIndex.trainCentroids(emb, "embedding", k = 8, iterations = 3)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq, "deterministic train")
    val assigned = VectorIndex.assignCells(emb, "embedding", c1)
    assert(assigned.filter(col("cell").isNull).count() === 0)
    assert(assigned.count() === emb.count())
    val cellsUsed = assigned.select("cell").distinct().count()
    assert(cellsUsed > 1, "k-means actually separates the space")
  }

  test("IVF search recall vs brute force") {
    val centroids = VectorIndex.trainCentroids(emb, "embedding", k = 8, iterations = 3)
    val indexed = VectorIndex.assignCells(emb, "embedding", centroids).cache()
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray

    val exact = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        VectorFns.cosine(col("embedding"),
          array(query.map(lit(_)): _*).cast("array<float>")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(10).collect().map(_.getLong(0)).toSet

    val approxAll = VectorIndex.search(spark, indexed.filter(col("vec_id") =!= 0),
      "embedding", "vec_id", centroids, query, k = 10, nProbe = 8)
      .collect().map(_.getLong(0)).toSet
    assert(approxAll === exact, "probing all cells == brute force")

    val approx2 = VectorIndex.search(spark, indexed.filter(col("vec_id") =!= 0),
      "embedding", "vec_id", centroids, query, k = 10, nProbe = 3)
      .collect().map(_.getLong(0)).toSet
    val recall = (approx2 & exact).size / 10.0
    assert(recall >= 0.5, s"nProbe=3/8 recall $recall too low")
  }

  test("signMatrix: deterministic, ±1-valued, seed-sensitive") {
    val a = VectorIndex.signMatrix(4, 8, "s1")
    val b = VectorIndex.signMatrix(4, 8, "s1")
    val c = VectorIndex.signMatrix(4, 8, "s2")
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(v => v == 1 || v == -1))
    assert(a.map(_.toSeq).toSeq !== c.map(_.toSeq).toSeq)
  }

  test("randomProject == hand-computed quantize-then-project") {
    import spark.implicits._
    val signs = VectorIndex.signMatrix(3, 4, "t")
    val vecs = Seq(
      (1L, Array(0.5f, -0.25f, 0.125f, 1.0f)),
      (2L, Array(-1.0f, 0.0f, 0.3f, -0.7f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = VectorIndex.randomProject(df, "embedding", signs)
      .select($"vec_id", $"proj").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val expected = vecs.map { case (id, v) =>
      val q = v.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong)
      id -> signs.map(row => row.zip(q).map { case (s, qi) => s * qi }.sum)
        .toSeq
    }.toMap
    assert(got === expected)
    // exact negative-value quantization: floor(-0.7*1000 + 0.5) = -700
    assert(expected(2L) === got(2L))
  }

  test("randomProject: projected distances correlate with true distances") {
    // JL property smoke test on the real embeddings: for a sample of
    // pairs, squared distance in the 16-dim integer sketch (rescaled)
    // stays within a loose multiplicative band of the true distance.
    val signs = VectorIndex.signMatrix(16, 64, "jl-spec")
    val rows = VectorIndex.randomProject(emb, "embedding", signs)
      .select(col("vec_id"), col("embedding"), col("proj"))
      .orderBy(col("vec_id")).limit(12).collect()
    val pairs = for (i <- rows.indices; j <- (i + 1) until rows.length)
      yield (rows(i), rows(j))
    val ok = pairs.count { case (a, b) =>
      val va = a.getSeq[Float](1); val vb = b.getSeq[Float](1)
      val trueSq = va.zip(vb).map { case (x, y) =>
        val d = x.toDouble - y; d * d }.sum * 1e6
      val pa = a.getSeq[Long](2); val pb = b.getSeq[Long](2)
      val projSq = pa.zip(pb).map { case (x, y) =>
        val d = (x - y).toDouble; d * d }.sum / 16.0
      trueSq == 0 || (projSq / trueSq > 0.2 && projSq / trueSq < 5.0)
    }
    assert(ok >= (pairs.size * 0.85).toInt,
      s"only $ok/${pairs.size} pairs within the JL band")
  }
}
