package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Geo
import graft.metrics.MetricsJson

/** Property tests for transform invariants (SURVEY.md §5): cleanup
  * idempotence, distance NaN/NULL propagation and symmetry, dedup
  * idempotence, JSON round-trips. Uses plain scalacheck generators with
  * fixed seeds (scalatestplus is not in the offline dependency cache). */
class PropertySpec extends SparkSpec {

  /** Deterministic sampling: n values of gen, seeded by index. */
  private def samples[A](gen: Gen[A], n: Int = 50): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val latGen = Gen.chooseNum(-89.9, 89.9)
  private val lonGen = Gen.chooseNum(-179.9, 179.9)
  private val pointPair = for {
    la1 <- latGen; lo1 <- lonGen; la2 <- latGen; lo2 <- lonGen
  } yield (la1, lo1, la2, lo2)

  test("vincenty: symmetric, non-negative, zero iff same point") {
    samples(pointPair, 100).foreach { case (la1, lo1, la2, lo2) =>
      val d12 = Geo.vincentyKm(la1, lo1, la2, lo2)
      val d21 = Geo.vincentyKm(la2, lo2, la1, lo1)
      if (!d12.isNaN && !d21.isNaN) {
        assert(d12 >= 0.0)
        assert(math.abs(d12 - d21) < 1e-6, s"asymmetric: $d12 vs $d21")
      }
    }
    assert(Geo.vincentyKm(10.0, 20.0, 10.0, 20.0) === 0.0)
  }

  test("vincenty within 0.6% of haversine everywhere (ellipsoid vs sphere)") {
    samples(pointPair, 100).foreach { case (la1, lo1, la2, lo2) =>
      val v = Geo.vincentyKm(la1, lo1, la2, lo2)
      if (!v.isNaN && v > 1.0) {
        val R = 6371.0088
        val dphi = math.toRadians(la2 - la1)
        val dl = math.toRadians(lo2 - lo1)
        val a = math.pow(math.sin(dphi / 2), 2) +
          math.cos(math.toRadians(la1)) * math.cos(math.toRadians(la2)) *
            math.pow(math.sin(dl / 2), 2)
        val h = 2 * R * math.asin(math.min(1.0, math.sqrt(a)))
        assert(math.abs(v - h) / v < 0.006, s"v=$v h=$h at ($la1,$lo1)-($la2,$lo2)")
      }
    }
  }

  test("station cleanup is idempotent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val strGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.const(' '), Gen.const(' '),
      Gen.const('ą'), Gen.const('#'))).map(_.mkString)
    val names = samples(strGen, 200).toList
    def clean(df: org.apache.spark.sql.DataFrame) = {
      val stripped = rtrim(regexp_replace(col("s"), " ", ""))
      df.select(when(stripped === "nan", lit(null)).otherwise(stripped).as("s"))
    }
    val once = clean(names.toDF("s")).collect().map(_.getString(0)).toSeq
    val twice = clean(clean(names.toDF("s"))).collect().map(_.getString(0)).toSeq
    assert(once === twice)
  }

  test("idempotent append: newRows(x, x) empty; newRows(x, empty) keeps keys") {
    import spark.implicits._
    val keys = samples(Gen.chooseNum(0L, 20L), 30).toList
    val df = keys.toDF("uid")
    assert(graft.store.IdempotentAppend.newRows(df, df, Seq("uid")).count() === 0)
    val empty = spark.emptyDataset[Long].toDF("uid")
    val kept = graft.store.IdempotentAppend.newRows(df, empty, Seq("uid"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === keys.distinct.sorted)
  }

  test("pyFloat renders plain decimal for metric-scale magnitudes") {
    samples(Gen.chooseNum(0.0, 1e12), 200).foreach { d =>
      val s = MetricsJson.pyFloat(d)
      assert(!s.contains("E") && !s.contains("e"), s)
      assert(math.abs(s.toDouble - d) <= math.ulp(d) * 4)
    }
  }

  test("JSON string escaping round-trips through a JSON parser") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    samples(Gen.asciiStr, 100).foreach { s =>
      assert(mapper.readTree(MetricsJson.q(s)).asText() === s)
    }
    // non-ascii + control chars explicitly
    Seq("Poza stacją", "a\nb\tc", "q\"q\\", "").foreach { s =>
      assert(mapper.readTree(MetricsJson.q(s)).asText() === s)
    }
  }

  test("as-of join: native merge exec == union+window on random keyed series") {
    import spark.implicits._
    // random (key, time) series; duplicate times across keys are common,
    // (key, time) made unique per side so the match is well-defined
    val rowGen = for {
      key <- Gen.chooseNum(0, 8)
      t <- Gen.chooseNum(0L, 2000L)
    } yield (key.toString, t)
    (0 until 5).foreach { round =>
      val leftRaw = samples(rowGen, 120).distinct.zipWithIndex
        .map { case ((k, t), i) => (k, new java.sql.Timestamp(t * 1000), i.toLong) }
      val rightRaw = samples(rowGen, 120).distinct.zipWithIndex
        .map { case ((k, t), i) =>
          (k, new java.sql.Timestamp((t + round * 7) * 1000), 1000L + i, i * 1.5)
        }
      val left = leftRaw.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        .toDF("k", "lt", "lid")
      val right = rightRaw.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        .toDF("k", "rt", "rid", "rv")
      val native = graft.plans.AsOfJoinNative
        .backward(left, right, Seq("k"), "lt", "rt")
        .select($"lid", $"asof_rid", $"asof_rv")
      val window = graft.operators.AsOfJoin
        .backward(left, right, Seq("k"), "lt", "rt", Seq("rid", "rv"))
        .select($"lid", $"asof_rid", $"asof_rv")
      assert(native.count() === left.count())
      assert(native.except(window).count() === 0 &&
        window.except(native).count() === 0, s"round $round diverged")
    }
  }

  test("star CC == propagation CC on random graphs") {
    import spark.implicits._
    import graft.ext.TextDedup
    val edgeGen = for {
      a <- Gen.chooseNum(1L, 60L); b <- Gen.chooseNum(1L, 60L) if a != b
    } yield (a, b)
    (0 until 5).foreach { round =>
      val edges = (0 until 40).flatMap(i =>
        edgeGen.apply(Gen.Parameters.default, Seed(round * 1000L + i)))
      val pairs = edges.toDF("id_a", "id_b")
      val nodes = (1L to 60L).toDF("id")
      val prop = TextDedup.connectedComponents(pairs, nodes, maxRounds = 60)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = TextDedup.connectedComponentsStar(pairs, nodes)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(prop === star, s"round $round diverged")
    }
  }

  test("banded LSH candidates == brute-force band agreement (bands 1/2/4)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.ext.TextDedup
    // small vocabulary => real shingle collisions => non-trivial buckets
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docGen = Gen.listOfN(8, wordGen).map(_.mkString(" "))
    (0 until 3).foreach { round =>
      val texts = (0 until 40).flatMap(i =>
        docGen.apply(Gen.Parameters.default, Seed(round * 500L + i)))
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      // signatures once (the banding under test REGROUPS these; the
      // signature math itself is cross-checked in TextDedupSpec)
      val sig = docs
        .withColumn("_toks", graft.functions.TextFns.tokens($"text"))
        .select($"doc_id",
          graft.plans.TextExpressions.minhashSig($"_toks", 3, 4).as("sig"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val ids = sig.keys.toSeq.sorted
      var prev = Set.empty[(Long, Long)]
      for (bands <- Seq(1, 2, 4)) {
        val rpb = 4 / bands
        val got = TextDedup
          .lshCandidates(docs, "text", "doc_id",
            ngram = 3, numHashes = 4, bands = bands)
          .as[(Long, Long)].collect().toSet
        // brute force: pair is a candidate iff SOME band agrees in full
        val want = (for {
          i <- ids; j <- ids if i < j
          if (0 until bands).exists(b =>
            (b * rpb until (b + 1) * rpb).forall(h => sig(i)(h) == sig(j)(h)))
        } yield (i, j)).toSet
        assert(got === want, s"round $round bands=$bands")
        // q125's recall knob: more/narrower bands only ADD candidates
        assert(prev.subsetOf(got), s"round $round bands=$bands lost recall")
        prev = got
      }
      assert(prev.nonEmpty, s"round $round degenerate: no candidates at all")
    }
  }

  test("similarityJoin == brute force at thresholds 1/3, 1/2, 2/3") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docGen = Gen.listOfN(10, wordGen).map(_.mkString(" "))
    val base = (0 until 30).flatMap(i =>
      docGen.apply(Gen.Parameters.default, Seed(9000L + i)))
    // random pairs rarely clear 1/3 Jaccard on 3-gram sets — seed the
    // fixture with REAL near-dups (suffix variants) so every threshold
    // has qualifying pairs to miss
    val texts = base ++ base.take(10).map(_ + " omega")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sets = docs.select($"doc_id", array_distinct(
        graft.functions.TextFns.ngramsFromTokens(
          graft.functions.TextFns.tokens($"text"), 3)).as("ng"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, ng) => id -> ng.toSet }
    for ((num, den) <- Seq((1, 3), (1, 2), (2, 3))) {
      val got = graft.ext.TextDedup
        .similarityJoin(docs, "text", "doc_id", ngram = 3,
          simNum = num, simDen = den)
        .select($"doc_a", $"doc_b")
        .as[(Long, Long)].collect().toSet
      val want = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        inter = sa.intersect(sb).size
        union = sa.size + sb.size - inter
        if inter * den >= union * num
      } yield (ia, ib)).toSet
      assert(got === want, s"threshold $num/$den")
      assert(want.nonEmpty, s"degenerate fixture at $num/$den")
    }
  }

  test("containmentJoin == brute force at t=4/5 on length-skewed corpora") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta")
    // short docs (6 tokens) + long docs (30 tokens) + WRAPPED docs — a
    // short doc embedded in noise, so |B| ≫ |A| qualifying pairs exist
    val shortGen = Gen.listOfN(6, wordGen).map(_.mkString(" "))
    val longGen = Gen.listOfN(30, wordGen).map(_.mkString(" "))
    for (round <- 0 until 3) {
      val shorts = (0 until 12).flatMap(i =>
        shortGen.apply(Gen.Parameters.default, Seed(round * 100L + i)))
      val longs = (0 until 8).flatMap(i =>
        longGen.apply(Gen.Parameters.default, Seed(round * 100L + 50 + i)))
      val wrapped = shorts.take(4).zip(longs.take(4))
        .map { case (s, l) => l.split(" ").take(10).mkString(" ") + " " + s }
      val texts = shorts ++ longs ++ wrapped
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val sets = docs.select($"doc_id", array_distinct(
          graft.functions.TextFns.ngramsFromTokens(
            graft.functions.TextFns.tokens($"text"), 3)).as("ng"))
        .as[(Long, Seq[String])].collect()
        .map { case (id, ng) => id -> ng.toSet }
      val got = graft.ext.TextDedup
        .containmentJoin(docs, "text", "doc_id", ngram = 3,
          simNum = 4, simDen = 5)
        .select($"doc_in", $"doc_out").as[(Long, Long)].collect().toSet
      val want = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
        if sa.intersect(sb).size * 5 >= sa.size * 4
      } yield (ia, ib)).toSet
      assert(got === want, s"round $round")
      assert(want.exists { case (a, b) =>
        sets.toMap.apply(b).size > 2 * sets.toMap.apply(a).size
      }, s"round $round degenerate: no |B| >> |A| qualifying pair")
    }
  }

  test("TopKLong distributed == sort-take, any k, random data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rowGen = for {
      g <- Gen.oneOf("a", "b", "c"); v <- Gen.chooseNum(-1000L, 1000L)
    } yield (g, v)
    (1 to 4).foreach { k =>
      val rows = (0 until 200).flatMap(i =>
        rowGen.apply(Gen.Parameters.default, Seed(k * 10000L + i)))
      val df = rows.toDF("g", "v").repartition(7) // force partial+merge
      val topk = udaf(graft.functions.TopKLong(k))
      val got = df.groupBy($"g").agg(topk($"v").as("t"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
      val want = rows.groupBy(_._1).map { case (g, vs) =>
        g -> vs.map(_._2).sorted(Ordering[Long].reverse).take(k).toList
      }
      assert(got === want, s"k=$k")
    }
  }

  test("bpeMerges == brute-force BPE on random small-alphabet corpora") {
    import spark.implicits._
    // 3-letter alphabet forces dense pair collisions, ties, and runs
    // ("aa", "aab", ...) — the cases where argmax tie-breaks and the
    // non-overlapping replace semantics could diverge from brute force
    val wordGen = for {
      len <- Gen.chooseNum(1, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      cnt <- Gen.chooseNum(1L, 9L)
    } yield (cs.mkString, cnt)
    (0 until 4).foreach { round =>
      val raw = (0 until 30).flatMap(i =>
        wordGen.apply(Gen.Parameters.default, Seed(round * 1000L + i)))
      // distinct words (the operator contract): keep max cnt per word
      val words = raw.groupBy(_._1).map { case (w, g) =>
        (w, g.map(_._2).max)
      }.toSeq
      val (mergesDf, encodedDf) = graft.ext.TrainPrep.bpeMerges(
        words.toDF("word", "cnt").repartition(5), "word", "cnt",
        rounds = 4)
      val gotMerges = mergesDf.orderBy("round").collect().map(r =>
        (r.getAs[Long]("round"), r.getAs[String]("pair"),
          r.getAs[String]("merged"), r.getAs[Long]("pair_cnt"),
          r.getAs[Long]("vocab_after"), r.getAs[Long]("tokens_after")))
        .toSeq
      // brute force with Java-replace semantics (the shared contract)
      var syms = words.map { case (w, c) => (w.toCharArray.mkString(" "), c) }
      val expMerges = (1 to 4).flatMap { r =>
        val pc = scala.collection.mutable.Map.empty[String, Long]
        syms.foreach { case (sym, c) =>
          val a = sym.split(" ")
          if (a.length >= 2) a.sliding(2).foreach { p =>
            val k = p.mkString(" "); pc(k) = pc.getOrElse(k, 0L) + c
          }
        }
        val picked = if (pc.isEmpty) None
          else Some(pc.toSeq.minBy { case (p, c) => (-c, p) })
        picked.foreach { case (pair, _) =>
          val merged = pair.replace(" ", "")
          syms = syms.map { case (sym, c) =>
            ((" " + sym + " ")
              .replace(" " + pair + " ", " " + merged + " ").trim, c)
          }
        }
        val vocab = syms.flatMap(_._1.split(" ")).distinct.size.toLong
        val toks = syms.map { case (s0, c) => c * s0.split(" ").length }.sum
        Seq((r.toLong, picked.map(_._1).orNull,
          picked.map(_._1.replace(" ", "")).orNull,
          picked.map(_._2).getOrElse(0L), vocab, toks))
      }
      // degenerate rounds emit NULL pair with pair_cnt NULL in the
      // frame; normalize brute's 0L sentinel for comparison
      val normGot = gotMerges.map(t =>
        if (t._2 == null) t.copy(_4 = 0L) else t)
      assert(normGot === expMerges, s"corpus seed round $round")
      val gotEnc = encodedDf.collect()
        .map(r => (r.getAs[String]("sym"), r.getAs[Long]("cnt")))
        .sortBy(identity).toSeq
      assert(gotEnc === syms.sortBy(identity), s"encoded, seed $round")
    }
  }
}
