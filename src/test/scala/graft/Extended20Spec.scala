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

  test("refineExact with the whole corpus shortlisted == brute-force top-k") {
    import spark.implicits._
    val e = graft.queries.Tables.load(spark, dir, "embeddings")
    val qRow = e.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).toArray
    val corpus = e.filter($"vec_id" =!= 0)
    val refined = graft.ext.VectorIndex
      .refineExact(corpus.select($"vec_id"), corpus,
        "embedding", "vec_id", qRow, k = 10)
      .as[(Long, Long)].collect().toSeq
    val brute = corpus
      .select($"vec_id", floor(graft.functions.VectorFns.cosine(
          $"embedding", array(qRow.map(lit(_)): _*).cast("array<float>"))
        * 10000.0 + 0.5).cast("long").as("bp"))
      .orderBy($"bp".desc, $"vec_id".asc).limit(10)
      .as[(Long, Long)].collect().toSeq
    assert(refined === brute)
  }

  test("q204: adc <= refined <= probed-cells ceiling; arithmetic consistent") {
    import spark.implicits._
    val got = Extended20.q204(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq("ivf_pq_adc", "ivf_pq_refine"))
    got.foreach { case (m, n, ppm) =>
      assert(n >= 0L && n <= 10L, s"$m n_common=$n")
      assert(ppm === n * 1000000L / 10L, s"$m recall_ppm inconsistent")
    }
    val Seq(adc, refined) = got.map(_._2)
    assert(refined >= adc,
      s"exact re-rank of a 30-superset lost recall: adc=$adc refined=$refined")
    // the ceiling: exact top-10 restricted to the probed cells — refine
    // can recover quantization error but never an unprobed cell
    val e = graft.queries.Tables.load(spark, dir, "embeddings")
    val qRow = e.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).toArray
    val idx = graft.ext.VectorIndex.ivfPqBuild(e, "embedding", "vec_id",
      kCoarse = 8, coarseIters = 1, m = 2, kSub = 32, pqIters = 1)
    val probedAll = graft.ext.VectorIndex.ivfPqSearch(
      idx.codes.filter($"vec_id" =!= 0), "vec_id", idx, qRow,
      k = 1000000, nProbe = 3)
    val ceilTop = graft.ext.VectorIndex.refineExact(probedAll,
      e.filter($"vec_id" =!= 0), "embedding", "vec_id", qRow, k = 10)
      .select($"vec_id".as("id"), $"score_bp".as("score"))
    val exact = e.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(e.filter($"vec_id" === 0)
        .select($"embedding".as("qvec"))))
      .select($"vec_id".as("id"),
        floor(graft.functions.VectorFns.cosine($"embedding", $"qvec")
          * 10000.0 + 0.5).cast("long").as("score"))
    val ceiling = graft.ext.Retrieval
      .recallAtK(ceilTop, exact, "id", "score", k = 10)
      .select($"n_common").head().getLong(0)
    assert(refined <= ceiling,
      s"refined=$refined exceeds probed-cells ceiling=$ceiling")
  }

  test("packed hamming == unpacked sign-mismatch count (all 64 bits, incl. bit 63)") {
    import spark.implicits._
    val e = graft.queries.Tables.load(spark, dir, "embeddings")
    val qRow = e.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).toArray
    val qCode = qRow.zipWithIndex
      .collect { case (x, i) if x >= 0 => 1L << i }.foldLeft(0L)(_ | _)
    val qLit = array(qRow.map(lit(_)): _*).cast("array<float>")
    // bit 63 is the Long sign bit: the packed code of a vector whose
    // 64th component is >= 0 is NEGATIVE, and xor/popcount must still
    // count it — the unpacked HOF sum is the independent witness
    val drift = e.select(
        graft.functions.VectorFns.hamming(
          graft.functions.VectorFns.signBucket($"embedding", 64),
          lit(qCode)).cast("long").as("packed"),
        aggregate(zip_with($"embedding", qLit, (x, y) =>
            when((x >= 0) =!= (y >= 0), 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v).as("unpacked"))
      .filter($"packed" =!= $"unpacked").count()
    assert(drift === 0L)
    assert(qCode < 0L || qRow(63) < 0,
      "fixture never exercised the sign bit — pick a different witness")
  }

  test("q206: refine recovers recall over raw hamming; binarySearch guards") {
    import spark.implicits._
    val got = Extended20.q206(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq("bq_hamming", "bq_refine"))
    got.foreach { case (m, n, ppm) =>
      assert(n >= 0L && n <= 10L, s"$m n_common=$n")
      assert(ppm === n * 1000000L / 10L, s"$m recall_ppm inconsistent")
    }
    // every exact-top-10 member the direct read-out found is in the
    // 30-shortlist and survives exact re-rank (at most 9 others beat
    // it anywhere), so refine can only add recall
    assert(got(1)._2 >= got(0)._2,
      s"refine lost recall: ${got(0)._2} -> ${got(1)._2}")
    val e = graft.queries.Tables.load(spark, dir, "embeddings")
    val qRow = e.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).toArray
    intercept[IllegalArgumentException] {
      graft.ext.VectorIndex.binarySearch(e, "embedding", "vec_id",
        qRow.take(32), k = 5, bits = 64)
    }
    intercept[IllegalArgumentException] {
      graft.ext.VectorIndex.binarySearch(
        e.select($"vec_id", slice($"embedding", 1, 16).as("embedding")),
        "embedding", "vec_id", qRow, k = 5, bits = 64)
    }
  }

  test("stratifiedSplit: exact counts, row-identical to the windowed form, window-free plan") {
    import spark.implicits._
    val got = Extended20.q207(spark, dir)
    // the scale claim: ranks come from the two-pass prefix sums, not a
    // per-source window that would single-task each source's extent
    assert(!got.queryExecution.executedPlan.toString.contains("Window"),
      "q207's plan contains a window operator")
    val rows = got.as[(Long, String, String)].collect()
    // guaranteed allocations: per source, exactly n·ppm div 1e6 each
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val n = rs.length.toLong
      val bySplit = rs.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      assert(bySplit.getOrElse("val", 0L) === n * 100000L / 1000000L, src)
      assert(bySplit.getOrElse("test", 0L) ===
        n * 300000L / 1000000L - n * 100000L / 1000000L, src)
      assert(bySplit.getOrElse("train", 0L) ===
        n - n * 300000L / 1000000L, src)
    }
    // row identity against the plain windowed implementation
    val d = graft.queries.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source")
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"source")
      .orderBy((($"doc_id" % 1048576L) * 2654435761L) % 4294967296L,
        $"doc_id")
    val expected = d
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy($"source")))
      .select($"doc_id", $"source",
        when($"rn" <= expr("n * 100000L div 1000000L"), "val")
          .when($"rn" <= expr("n * 300000L div 1000000L"), "test")
          .otherwise("train").as("split"))
      .as[(Long, String, String)].collect()
    assert(rows.sortBy(_._1) === expected.sortBy(_._1))
    // contract guards
    intercept[IllegalArgumentException] {
      graft.ext.TrainPrep.stratifiedSplit(d, Seq("source"), Seq($"doc_id"),
        Seq("a" -> 600000L, "b" -> 600000L))
    }
    intercept[IllegalArgumentException] {
      graft.ext.TrainPrep.stratifiedSplit(d, Seq("source"), Seq($"doc_id"),
        Seq("train" -> 100000L))
    }
  }

  test("textRankKeywords: uniform on a cycle, hub-first on a star, q208 well-formed") {
    import spark.implicits._
    // "a b c d a" builds the undirected 4-cycle; every degree is 2, so
    // the uniform distribution is the exact fixpoint and the integer
    // arithmetic must hold it: 150e9 div 4 + 85 * (250e9 div 2 * 2)
    // div 100 = 250e9, bit-exact every superstep
    val cycle = Seq("a b c d a").toDF("text")
    val cr = graft.ext.Profile.textRankKeywords(cycle, "text", 3, 10)
      .as[(String, Long)].collect().toMap
    assert(cr === Map("a" -> 250000000000L, "b" -> 250000000000L,
      "c" -> 250000000000L, "d" -> 250000000000L))
    // star: h bridges every leaf — centrality must put it first even
    // though h and the leaves all appear once per edge
    val star = Seq("h a h b h c").toDF("text")
    val sr = graft.ext.Profile.textRankKeywords(star, "text", 3, 10)
      .as[(String, Long)].collect()
    assert(sr.head._1 === "h")
    assert(sr.tail.map(_._2).distinct.length === 1,
      "leaves are symmetric and must tie exactly")
    val got = Extended20.q208(spark, dir).as[(String, Long)].collect()
    assert(got.length === 15)
    assert(got.forall(_._2 > 0L))
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
  }

  test("ivfPqAppend == full encode under the same frozen training set; q209 probes appended rows") {
    import spark.implicits._
    val e = graft.queries.Tables.load(spark, dir, "embeddings")
    val old = e.filter($"vec_id" < 25)
    val fresh = e.filter($"vec_id" >= 25)
    val idx = graft.ext.VectorIndex.ivfPqBuild(old, "embedding", "vec_id",
      kCoarse = 4, coarseIters = 1, m = 2, kSub = 8, pqIters = 1)
    val appended = graft.ext.VectorIndex
      .ivfPqAppend(idx, fresh, "embedding", "vec_id")
    // THE contract: appending is exactly "encode everything with the
    // codebooks trained on old" — same build params, trainSample = old
    val full = graft.ext.VectorIndex.ivfPqBuild(e, "embedding", "vec_id",
      kCoarse = 4, coarseIters = 1, m = 2, kSub = 8, pqIters = 1,
      trainSample = Some(old))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select($"vec_id", $"cell", $"code".cast("array<int>"))
      .as[(Long, Int, Seq[Int])].collect().sortBy(_._1).toSeq
    assert(canon(appended.codes) === canon(full.codes))
    assert(appended.codes.count() === e.count())
    // the gate query must actually read appended rows — at the gate SF
    // (sf0.01, 500 vectors; the q209 cutoff 250 splits it in half) the
    // probe's top-10 includes ids from the appended half
    val got = Extended20.q209(spark, "/root/testdata/sf0.01")
      .as[(Long, Int, Long)].collect()
    assert(got.length === 10)
    assert(got.exists(_._1 >= 250L),
      "q209's probe returned only pre-append ids — append path untested")
  }

  test("datasheet: exact counts/rates on a constructed corpus; q210 one row per source") {
    import spark.implicits._
    // source A: 4 docs, one exact dup pair, langs {en, de}, en majority;
    // one doc under the 5-char short threshold. source B: 2 docs, tie
    // between langs breaks to the DESC one
    val docs = Seq(
      ("A", "hello world", "en"), ("A", "hello world", "en"),
      ("A", "abc", "en"), ("A", "guten tag welt", "de"),
      ("B", "one", "en"), ("B", "zwei", "de")
    ).toDF("source", "text", "lang")
    val got = graft.ext.Profile
      .datasheet(docs, "source", "text", "lang", shortBelowChars = 5)
      .orderBy($"source")
      .as[(String, Long, Long, Long, Long, Long, Long, String)]
      .collect().toSeq
    val aChars = 11L + 11L + 3L + 14L
    assert(got === Seq(
      ("A", 4L, aChars, aChars / 4L, 250000L, 250000L, 2L, "en"),
      ("B", 2L, 7L, 3L, 1000000L, 0L, 2L, "en")))
    val q = Extended20.q210(spark, dir).collect()
    assert(q.length === graft.queries.Tables.load(spark, dir, "documents")
      .select($"source").distinct().count())
  }

  test("q205: dims ascend per MatryoshkaDims; full-dim rung is exact") {
    import spark.implicits._
    val got = Extended20.q205(spark, dir)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got.map(_._1) === graft.queries.Extended20.MatryoshkaDims)
    got.foreach { case (d, n, ppm) =>
      assert(n >= 0L && n <= 10L, s"dim $d n_common=$n")
      assert(ppm === n * 1000000L / 10L, s"dim $d recall_ppm inconsistent")
    }
    assert(got.last._3 === 1000000L,
      "full-dimension prefix must reproduce the brute-force top-10")
  }
}
