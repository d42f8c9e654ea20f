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

  test("bandedScoredPairs: superset of single-band, scores == brute cosine") {
    import spark.implicits._
    val single = VectorIndex
      .bandedScoredPairs(emb, "embedding", "vec_id", bits = 4, bands = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val banded = VectorIndex
      .bandedScoredPairs(emb, "embedding", "vec_id", bits = 4, bands = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(single.keySet.subsetOf(banded.keySet),
      "band 0 of the banded blocker IS the single-band bucket — banded " +
        "candidates must be a superset")
    assert(banded.size > single.size,
      "band 1 should contribute additional candidates on this fixture")
    // every banded score equals the brute-force cosine in round-half-up
    // basis points (the generator's precomputed-norm tree is bit-stable
    // against the inline-cosine form)
    val brute = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"),
        floor(VectorFns.cosine($"a.embedding", $"b.embedding")
          * 10000.0 + 0.5).cast("long").as("cos_bp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    banded.foreach { case (k, v) =>
      assert(brute(k) === v, s"pair $k score drift vs brute force")
    }
    single.foreach { case (k, v) => assert(banded(k) === v) }
  }

  test("banded dendrogram strictly dominates single-band toward all-pairs truth") {
    // the q196 shape: blocked pairs -> threshold cuts -> CC cluster
    // stats. Blocking is lossy by design, so exact equality with the
    // all-pairs graph is NOT the contract; the contract is MONOTONE
    // RECALL: banded edges are a superset of single-band edges, so
    // every single-band cluster sits INSIDE one banded cluster (exact
    // coarsening), and the banded cut recovers strictly more of the
    // true above-tau pair mass on this fixture (measured here:
    // single-band finds 7,972 candidate pairs, banded 15,409, of
    // 124,750 all-pairs — at tau=2000 that's 3 clusters vs 63,
    // against the all-pairs truth of 1).
    import spark.implicits._
    val nodes = emb.select($"vec_id".as("id"))
    val singleP = VectorIndex.bandedScoredPairs(emb, "embedding", "vec_id",
      bits = 4, bands = 1).localCheckpoint()
    val bandedP = VectorIndex.bandedScoredPairs(emb, "embedding", "vec_id",
      bits = 4, bands = 2, bucketCap = Some(1000L)).localCheckpoint()
    val allP = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"),
        floor(VectorFns.cosine($"a.embedding", $"b.embedding")
          * 10000.0 + 0.5).cast("long").as("cos_bp"))
      .localCheckpoint()
    Seq(3000L, 2000L, 1000L).foreach { tau =>
      def comp(p: org.apache.spark.sql.DataFrame) =
        graft.ext.TextDedup.connectedComponents(
          p.filter($"cos_bp" >= tau), nodes, "ia", "ib", "id", maxRounds = 40)
      val cs = comp(singleP).select($"node", $"component".as("cs"))
      val cb = comp(bandedP).select($"node", $"component".as("cb"))
      // refinement: a single-band cluster never splits across two
      // banded clusters (superset edges can only merge, never cut)
      val split = cs.join(cb, "node").groupBy($"cs")
        .agg(countDistinct($"cb").as("n")).filter($"n" > 1L).count()
      assert(split === 0L, s"tau=$tau: single-band cluster split by banded")
      // recall: banded captures >= of the true above-tau pairs, and
      // strictly more at the taus where single-band misses some
      val truePairs = allP.filter($"cos_bp" >= tau)
        .select($"ia", $"ib").as[(Long, Long)].collect().toSet
      def captured(p: org.apache.spark.sql.DataFrame) =
        p.filter($"cos_bp" >= tau).select($"ia", $"ib")
          .as[(Long, Long)].collect().toSet.intersect(truePairs).size
      val (nS, nB) = (captured(singleP), captured(bandedP))
      assert(nB >= nS, s"tau=$tau banded recall regressed")
      if (nS < truePairs.size)
        assert(nB > nS, s"tau=$tau band 1 added no recall")
    }
  }

  test("IVF-PQ search == JVM replay of the per-cell ADC math") {
    import spark.implicits._
    val idx = VectorIndex.ivfPqBuild(emb, "embedding", "vec_id",
      kCoarse = 4, coarseIters = 1, m = 2, kSub = 4, pqIters = 1)
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val rows = idx.codes.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("cell"), col("code"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
    def cosd(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      d / (na * nb)
    }
    val dsub = idx.codebook.head.head.length
    // per-cell LUT from the query residual, replayed in plain Scala
    def lut(cell: Int): Array[Array[Long]] = {
      val qr = qv.map(_.toDouble).zip(idx.coarse(cell))
        .map { case (x, c) => x - c.toDouble }
      idx.codebook.zipWithIndex.map { case (cents, j) =>
        cents.map { c =>
          val d2 = c.zipWithIndex.map { case (cv, t) =>
            val d = qr(j * dsub + t) - cv; d * d
          }.reduceLeft(_ + _)
          math.floor(d2 * 1000000.0).toLong
        }
      }
    }
    for (nProbe <- Seq(2, 4)) {
      val probed = idx.coarse.zipWithIndex
        .sortBy { case (c, _) => -cosd(c, qv) }.take(nProbe).map(_._2).toSet
      val luts = probed.map(c => c -> lut(c)).toMap
      val want = rows.filter { case (_, cell, _) => probed(cell) }
        .map { case (id, cell, code) =>
          (id, cell, code.zipWithIndex.map { case (ci, j) =>
            luts(cell)(j)(ci) }.sum)
        }.sortBy { case (id, _, d) => (d, id) }.take(10).toSeq
      val got = VectorIndex.ivfPqSearch(
        idx.codes.filter(col("vec_id") =!= 0), "vec_id", idx, qv,
        k = 10, nProbe = nProbe)
        .as[(Long, Int, Long)].collect().toSeq
      assert(got === want, s"nProbe=$nProbe ADC drift")
    }
  }

  test("IVF-PQ writeCodes: probe prunes to the probed cells' partitions") {
    import spark.implicits._
    val built = VectorIndex.ivfPqBuild(emb, "embedding", "vec_id",
      kCoarse = 4, coarseIters = 1, m = 2, kSub = 4, pqIters = 1)
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val dir = tmpDir("ivfpq-codes")
    val onDisk = VectorIndex.writeCodes(built, dir)
    val mem = VectorIndex.ivfPqSearch(
      built.codes.filter(col("vec_id") =!= 0), "vec_id", built, qv,
      k = 10, nProbe = 2).as[(Long, Int, Long)].collect().toSeq
    val q = VectorIndex.ivfPqSearch(
      onDisk.codes.filter(col("vec_id") =!= 0), "vec_id", onDisk, qv,
      k = 10, nProbe = 2)
    assert(q.as[(Long, Int, Long)].collect().toSeq === mem,
      "partitioned layout must not change results")
    // partition pruning is load-bearing: the codes scan must carry the
    // cell partition filter (only the probed cells' files are read)
    val plan = q.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(plan)
    assert(pf.isDefined && pf.get.group(1).contains("cell"),
      s"no cell partition filter in codes scan:\n$plan")
  }

  test("bandedScoredPairs bucketCap: saturated band degrades per band") {
    import spark.implicits._
    // all four vectors share band 0's bucket (first 4 components
    // positive); band 1 separates {1,2} from {3,4}. cap=2 saturates
    // band 0 (4 members) but not band 1 (2 each).
    val vs = Seq(
      (1L, Array(1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)),
      (2L, Array(1f, 1f, 1f, 1f, 1f, 1f, 1f, 0.9f)),
      (3L, Array(1f, 1f, 1f, 1f, -1f, -1f, -1f, -1f)),
      (4L, Array(1f, 1f, 1f, 1f, -1f, -1f, -1f, -0.9f))
    ).toDF("vec_id", "embedding")
    val capped = VectorIndex.bandedScoredPairs(vs, "embedding", "vec_id",
      bits = 4, bands = 2, bucketCap = Some(2L))
      .select($"ia", $"ib").as[(Long, Long)].collect().toSet
    // band 0 would have produced all 6 pairs; band 1 keeps the two
    // within-bucket pairs — the per-band loss mode
    assert(capped === Set((1L, 2L), (3L, 4L)))
    // single-band capping is all-or-nothing: same cap, bands = 1 -> no
    // pairs at all (the failure shape bands >= 2 exists to avoid)
    val singleCapped = VectorIndex.bandedScoredPairs(vs, "embedding", "vec_id",
      bits = 4, bands = 1, bucketCap = Some(2L)).count()
    assert(singleCapped === 0L)
  }
}
