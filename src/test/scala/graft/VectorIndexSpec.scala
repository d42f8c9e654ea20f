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
}
