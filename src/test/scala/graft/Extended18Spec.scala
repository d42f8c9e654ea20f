package graft

import org.apache.spark.sql.functions._

import graft.ext.{BloomSketch, LanguageModel, Retrieval, Graph}

/** Round-10 operator contracts, proven against in-memory brute force:
  *
  *  - LanguageModel: interpolated bigram NLL scores == a Scala
  *    reimplementation bit-for-bit (same double ops, same floors);
  *    shard-merge of count frames == whole-corpus counts;
  *  - BloomSketch: zero false negatives ever; prunedAntiJoin returns
  *    EXACTLY the plain anti join; OR-merge of shard sketches ==
  *    sketch of the union, word-for-word;
  *  - Retrieval.rrfFuse == brute-force RRF including tie handling and
  *    absent-rank nulls;
  *  - personalizedPageRank == brute-force integer simulation (3 rounds
  *    and fixpoint), including seeds with no edges.
  */
class Extended18Spec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------
  // LanguageModel

  private val corpus = Seq(
    (0L, "the cat sat on the mat", "en"),
    (1L, "the dog sat on the log", "en"),
    (2L, "the cat and the dog", "en"),
    (3L, "cat cat cat cat", "en"),
    (4L, "le chat est sur le tapis", "fr"),
    (5L, "der hund sitzt auf dem baum", "de"),
    (6L, "one", "en"), // single token: no transitions
    (7L, "dog mat unseen pair", "en"))

  private def bruteBigrams(text: String): Seq[(String, String)] = {
    val toks = text.trim.split("\\s+").toSeq
    if (toks.length < 2) Nil else toks.zip(toks.tail)
  }

  test("bigram LM scoring == brute-force reimplementation, bit for bit") {
    val docs = corpus.toDF("doc_id", "text", "lang")
    val train = corpus.filter(_._3 == "en")

    // brute model from the en slice
    val pairs = train.flatMap(d => bruteBigrams(d._2))
    val c = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cu = c.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val cv = c.groupBy(_._1._2).map { case (k, v) => k -> v.values.sum }
    val n = c.values.sum
    def nll(u: String, v: String): Long =
      c.get((u, v)) match {
        case Some(cc) =>
          math.floor(-math.log(
            0.9 * cc / cu(u) + 0.1 * cv(v) / n) * 1000000.0).toLong
        case None => cv.get(v) match {
          case Some(cvv) =>
            math.floor(-math.log(0.1 * cvv / n) * 1000000.0).toLong
          case None => 20000000L
        }
      }
    val expected = corpus.flatMap { d =>
      val bgs = bruteBigrams(d._2)
      if (bgs.isEmpty) None
      else {
        val sum = bgs.map { case (u, v) => nll(u, v) }.sum
        Some((d._1, bgs.size.toLong, sum, sum / bgs.size))
      }
    }.sortBy(_._1)

    val model = LanguageModel.bigramModel(
      LanguageModel.bigramCounts(docs.filter($"lang" === "en"), "text", "doc_id"))
    val got = LanguageModel.scoreBigrams(docs, "text", "doc_id", model)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
  }

  test("bigram count shards merge to the whole-corpus counts") {
    val docs = corpus.toDF("doc_id", "text", "lang")
    val whole = LanguageModel.bigramCounts(docs, "text", "doc_id")
      .as[(String, String, Long)].collect().toSet
    val shards = Seq(0L, 1L).map(p =>
      LanguageModel.bigramCounts(
        docs.filter(pmod($"doc_id", lit(2L)) === p), "text", "doc_id"))
    val merged = LanguageModel.mergeCounts(shards)
      .as[(String, String, Long)].collect().toSet
    assert(merged === whole)
  }

  // ------------------------------------------------------------------
  // BloomSketch

  test("bloom: zero false negatives; pruned anti join == plain anti join") {
    val numBits = 512
    val dimKeys = (0L until 400L by 7L).toSeq
    val dim = dimKeys.toDF("k")
    val fact = (0L until 400L).map(i => (i, s"row$i")).toDF("fk", "payload")

    val bloom = broadcast(
      BloomSketch.packed(BloomSketch.addAll(dim, "k", numBits, 5), numBits))
    val misses = dim.crossJoin(bloom)
      .filter(!BloomSketch.mightContain($"k", $"bloom", numBits, 5))
      .count()
    assert(misses === 0L, "a member probed false — broken no-FN contract")

    val exact = fact
      .join(dim.select($"k".as("fk")), Seq("fk"), "left_anti")
      .as[(Long, String)].collect().toSet
    val pruned = BloomSketch
      .prunedAntiJoin(fact, "fk", dim, "k", numBits, 5)
      .as[(Long, String)].collect().toSet
    assert(pruned === exact)
  }

  test("bloom: OR-merge of shard sketches == sketch of the union") {
    val numBits = 256
    val a = (0L until 50L).toDF("k")
    val b = (30L until 90L).toDF("k")
    val union = (0L until 90L).toDF("k")
    val merged = BloomSketch.merge(Seq(
        BloomSketch.addAll(a, "k", numBits, 4),
        BloomSketch.addAll(b, "k", numBits, 4)))
      .as[(Int, Long)].collect().toMap
    val direct = BloomSketch.addAll(union, "k", numBits, 4)
      .as[(Int, Long)].collect().toMap
    assert(merged === direct)
  }

  test("bloom: packed array is dense, length ceil(bits/64)") {
    val numBits = 320
    val words = BloomSketch.addAll(Seq(1L, 2L).toDF("k"), "k", numBits, 3)
    val arr = BloomSketch.packed(words, numBits)
      .as[Seq[Long]].head()
    assert(arr.length === 5)
  }

  // ------------------------------------------------------------------
  // Retrieval.rrfFuse

  test("rrfFuse == brute-force RRF with ties and absent ranks") {
    // list A: scores with a tie (ids 3,5 at 80 → rank by id asc)
    val la = Seq((1L, 100L), (3L, 80L), (5L, 80L), (7L, 10L)).toDF("id", "score")
    val lb = Seq((5L, 9L), (2L, 8L), (1L, 7L)).toDF("id", "score")
    def ranks(l: Seq[(Long, Long)]): Map[Long, Long] =
      l.sortBy { case (id, sc) => (-sc, id) }.zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val ra = ranks(Seq((1L, 100L), (3L, 80L), (5L, 80L), (7L, 10L)))
    val rb = ranks(Seq((5L, 9L), (2L, 8L), (1L, 7L)))
    val ids = (ra.keySet ++ rb.keySet).toSeq
    val expected = ids.map { id =>
      val c = ra.get(id).map(r => 1000000000L / (60 + r)).getOrElse(0L) +
        rb.get(id).map(r => 1000000000L / (60 + r)).getOrElse(0L)
      (id, c, ra.get(id).size + rb.get(id).size,
        ra.get(id), rb.get(id))
    }.sortBy { case (id, c, _, _, _) => (-c, id) }

    val got = Retrieval.rrfFuse(Seq("a" -> la, "b" -> lb), "id", "score")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSeq
    assert(got === expected.map { case (id, c, nl, x, y) => (id, c, nl.toLong, x, y) })
  }

  test("ndcg == brute-force graded DCG with exponential gain") {
    // ranking with a non-relevant doc at rank 1 (score ties broken by
    // id), judgments missing one ranked id (rel -> 0 via left join)
    val ranking = Seq((5L, 90L), (1L, 80L), (2L, 80L), (9L, 10L))
      .toDF("id", "score")
    val judgments = Seq((1L, 2L), (2L, 1L), (5L, 0L), (7L, 2L), (8L, 1L))
      .toDF("id", "rel")
    def term(rel: Long, rank: Long): Long =
      math.floor((math.pow(2.0, rel.toDouble) - 1.0) * math.log(2.0) /
        math.log(rank.toDouble + 1.0) * 1000000.0).toLong
    // ranks: (90,5)->1, (80,1)->2, (80,2)->3, (10,9)->4; rel 0,2,1,0
    val dcg = term(0, 1) + term(2, 2) + term(1, 3) + term(0, 4)
    // ideal top-3 by (rel desc, id): (1,2),(7,2),(2,1),(8,1),(5,0)
    val idcg = term(2, 1) + term(2, 2) + term(1, 3)
    val got = graft.ext.Retrieval
      .ndcg(ranking, judgments, "id", "score", "rel", k = 3)
      .as[(Long, Long, Long)].head()
    val dcg3 = term(0, 1) + term(2, 2) + term(1, 3) // k=3 cuts rank 4
    assert(got === ((dcg3, idcg, dcg3 * 1000000L / idcg)))
    assert(dcg >= dcg3) // sanity on the brute model itself
  }

  test("rbo == brute-force exact-integer rank-biased overlap") {
    val la = Seq((1L, 100L), (2L, 90L), (3L, 80L), (4L, 70L)).toDF("id", "score")
    val lb = Seq((2L, 50L), (1L, 40L), (9L, 30L), (4L, 20L)).toDF("id", "score")
    // ranks: A: 1->1 2->2 3->3 4->4; B: 2->1 1->2 9->3 4->4
    // joint m: id1 max(1,2)=2; id2 max(2,1)=2; id4 max(4,4)=4
    val m = Seq(2L, 2L, 4L)
    val k = 4
    val expected = (1 to k).map { d =>
      val overlap = m.count(_ <= d).toLong
      overlap * 1L * BigInt(9).pow(d - 1).toLong * 1000000000L /
        (BigInt(10).pow(d).toLong * d)
    }.sum
    val got = graft.ext.Retrieval.rbo(la, lb, "id", "score", k = 4)
      .as[(Long, Long)].head()
    assert(got === ((3L, expected)))
  }

  test("Index.merge of disjoint shards == whole-corpus build, frame for frame") {
    val docs = Seq((0L, "big data rules"), (1L, "cats and dogs"),
      (2L, "more data cats"), (3L, "data data dogs"), (4L, "just cats"))
      .toDF("doc_id", "text")
    val whole = graft.ext.Index.build(docs, "text", "doc_id")
    val shards = Seq(0L, 1L).map(p => graft.ext.Index.build(
      docs.filter(pmod($"doc_id", lit(2L)) === p), "text", "doc_id"))
    val merged = graft.ext.Index.merge(shards)
    assert(merged.nDocs === whole.nDocs)
    assert(merged.sumDl === whole.sumDl)
    def dictSet(b: graft.ext.Index.Built) =
      b.dictionary.as[(String, Long, Long)].collect().toSet
    assert(dictSet(merged) === dictSet(whole))
    def postSet(b: graft.ext.Index.Built) =
      b.postings.select($"token", $"doc_id", $"dl", $"tf")
        .as[(String, Long, Long, Long)].collect().toSet
    assert(postSet(merged) === postSet(whole))
    def hits(b: graft.ext.Index.Built) =
      b.search(Seq("data", "cats"), 5).as[(Long, Long, Long)].collect().toSeq
    assert(hits(merged) === hits(whole))
    // re-cap on merge == cap on whole build (uncapped shards in)
    val cappedWhole = graft.ext.Index.build(docs, "text", "doc_id",
      postingCap = Some(2))
    val cappedMerged = graft.ext.Index.merge(shards, postingCap = Some(2))
    assert(postSet(cappedMerged) === postSet(cappedWhole))
  }

  test("recallAtK: exact overlap fraction in ppm") {
    val exact = Seq((1L, 9L), (2L, 8L), (3L, 7L), (4L, 6L)).toDF("id", "score")
    val approx = Seq((2L, 9L), (4L, 8L), (7L, 7L)).toDF("id", "score")
    val got = graft.ext.Retrieval
      .recallAtK(approx, exact, "id", "score", k = 4)
      .as[(Long, Long, Long)].head()
    assert(got === ((4L, 2L, 500000L)))
  }

  test("dsirImportance == brute-force log-likelihood ratio; target docs score higher") {
    val raw = Seq(
      (0L, "aa bb aa cc"), (1L, "bb cc dd"), (2L, "aa aa aa"),
      (3L, "dd dd ee"), (4L, "cc ee"))
    val target = Seq((0L, "aa bb aa cc"), (2L, "aa aa aa")) // aa-heavy
    val rawToks = raw.flatMap(_._2.split(" "))
    val cr = rawToks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ct = target.flatMap(_._2.split(" "))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val v = cr.size.toLong
    val nr = cr.values.sum
    val nt = ct.filter(kv => cr.contains(kv._1)).values.sum
    def lam(tok: String): Long =
      math.floor((math.log((ct.getOrElse(tok, 0L) + 1).toDouble / (nt + v))
        - math.log((cr(tok) + 1).toDouble / (nr + v))) * 1000000.0).toLong
    val expected = raw.map { case (id, text) =>
      val toks = text.split(" ").toSeq
      (id, toks.size.toLong, toks.map(lam).sum)
    }.toSet
    val got = graft.ext.TrainPrep
      .dsirImportance(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), "text", "doc_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected)
    // the aa-heavy docs (the target's signature) must outrank dd/ee docs
    val byId = got.map(x => x._1 -> x._3).toMap
    assert(byId(2L) > byId(3L) && byId(0L) > byId(3L), s"$byId")
  }

  test("longestCommonSpan == brute-force token-LCS (DP), sub-k pairs read 0") {
    def lcsTokens(x: String, y: String): Int = {
      val a = x.trim.split("\\s+"); val b = y.trim.split("\\s+")
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length)
        if (a(i - 1) == b(j - 1)) {
          dp(i)(j) = dp(i - 1)(j - 1) + 1
          best = math.max(best, dp(i)(j))
        }
      best
    }
    val docs = Seq(
      (1L, "p q r s t u v w x y z"),
      (2L, "a b c r s t u v w k l"), // shares "r s t u v w" (6) with 1
      (3L, "m n o p q r a b"),       // shares "p q r" (3 < k) with 1
      (4L, "completely different words here entirely"),
      (5L, "p q r s t u v w x y z")) // exact dup of 1 (11)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L))
    val got = graft.ext.TextDedup
      .longestCommonSpan(pairs.toDF("a", "b"), docs.toDF("doc_id", "text"),
        "text", "doc_id", k = 5)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val docMap = docs.toMap
    pairs.foreach { case (a, b) =>
      val brute = lcsTokens(docMap(a), docMap(b))
      val expect = if (brute >= 5) brute.toLong else 0L
      assert(got((a, b)) === expect, s"pair ($a,$b): brute=$brute")
    }
  }

  test("mmrSelect == brute-force greedy MMR; diversity actually kicks in") {
    // two tight "topics": ids 1-3 mutually similar and relevant,
    // ids 10-11 less relevant but dissimilar — plain top-3 would take
    // {1,2,3}; MMR at λ=7/10 must mix topics
    val cand = Seq((1L, 100L), (2L, 98L), (3L, 96L), (10L, 60L), (11L, 55L))
    val sims = Seq((1L, 2L, 95L), (1L, 3L, 93L), (2L, 3L, 94L),
      (10L, 11L, 20L), (1L, 10L, 5L), (2L, 10L, 6L), (3L, 10L, 4L),
      (1L, 11L, 7L), (2L, 11L, 8L), (3L, 11L, 6L))
    def brute(k: Int): Seq[(Long, Long, Long, Long, Long)] = {
      val simMap = sims.flatMap { case (a, b, s) =>
        Seq((a, b) -> s, (b, a) -> s)
      }.toMap
      var chosen = Seq.empty[Long]
      var out = Seq.empty[(Long, Long, Long, Long, Long)]
      for (r <- 1 to k) {
        val pool = cand.filterNot(c => chosen.contains(c._1))
        val scored = pool.map { case (id, rel) =>
          val ms = if (chosen.isEmpty) 0L
            else chosen.map(c => simMap.getOrElse((id, c), 0L)).max
          (id, rel, ms, 7L * rel - 3L * ms)
        }
        val w = scored.minBy { case (id, _, _, sc) => (-sc, id) }
        out = out :+ ((r.toLong, w._1, w._2, w._3, w._4))
        chosen = chosen :+ w._1
      }
      out
    }
    val got = graft.ext.Retrieval
      .mmrSelect(cand.toDF("id", "rel"), sims.toDF("a", "b", "sim"),
        "id", "rel", k = 4, lamNum = 7, lamDen = 10)
      .orderBy($"rank")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === brute(4))
    // topic mixing: the redundant {1,2,3} cluster must NOT fill the top 3
    val top3 = got.take(3).map(_._2).toSet
    assert(!(top3 subsetOf Set(1L, 2L, 3L)),
      s"MMR failed to diversify: $top3")
  }

  test("mmrSelect: sparse sims with negative values honor the absent=0 contract") {
    // Round 3 has chosen = {1, 4}. Candidate 2 records only a NEGATIVE
    // sim to 1 and nothing to 4 — the absent (2,4) pair contributes a
    // 0, so maxsim = max(−80, 0) = 0 and 2 scores 7·55 = 385.
    // Candidate 3 records BOTH pairs (sim 5 each) → 7·59 − 3·5 = 398 →
    // 3 must win round 3. An implementation that maxes only over
    // RECORDED pairs gives 2 a spurious +3·80 bonus (625) and picks it.
    val cand = Seq((1L, 100L), (4L, 95L), (2L, 55L), (3L, 59L))
      .toDF("id", "rel")
    val sims = Seq((2L, 1L, -80L), (3L, 1L, 5L), (3L, 4L, 5L))
      .toDF("a", "b", "sim")
    val got = graft.ext.Retrieval
      .mmrSelect(cand, sims, "id", "rel", k = 3, lamNum = 7, lamDen = 10)
      .orderBy($"rank")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // r1: 1 (700). r2 chosen={1}: 4 scores 695 (no pair → 0); 2's single
    // chosen-pair IS recorded so its −80 stands (385+240=625 < 695);
    // 3 scores 413−15=398. r3 chosen={1,4}: 3 (398) beats 2 (385).
    assert(got === Seq(
      (1L, 1L, 100L, 0L, 700L),
      (2L, 4L, 95L, 0L, 665L),
      (3L, 3L, 59L, 5L, 398L)))
  }

  test("ndcg term guard band: integer-exact at pow2 ranks, >=1e-3 off " +
      "boundaries elsewhere") {
    // the q130 technique applied to ndcg's floored micro terms. Two
    // regimes: rank+1 a power of two → ln2/ln(rank+1) is EXACTLY 1/j
    // and the scaled term sits ON an integer boundary (rel=1, rank=3 →
    // 500000.0 — a 1-ulp libm divergence would flip the floor), which
    // is why ndcg computes those ranks in pure integer arithmetic;
    // every OTHER rank's term must sit >=1e-3 from a boundary (~10⁶ ×
    // the cross-libm ulp divergence at this magnitude) across the full
    // graded domain (rel <= 5 — the scaladoc's 0-4 grade scale plus
    // one — and rank <= 20, double the gate's k).
    for (rel <- 1 to 5; rank <- 1 to 20) {
      val scaled = (math.pow(2.0, rel) - 1.0) *
        math.log(2.0) / math.log(rank + 1.0) * 1000000.0
      if (((rank + 1) & rank) == 0) {
        // exact-ratio rank: the integer path must reproduce the true
        // rational value (2^rel − 1)·10⁶ div j for j = log2(rank+1)
        val j = (math.round(math.log(rank + 1.0) / math.log(2.0))).toInt
        val intTerm = ((1L << rel) - 1L) * 1000000L / j
        assert(math.abs(scaled - ((1L << rel) - 1L) * 1000000.0 / j) < 1.0,
          s"rel=$rel rank=$rank: double and rational paths diverge")
        assert(intTerm === ((1L << rel) - 1L) * 1000000L / j)
      } else {
        val frac = scaled - math.floor(scaled)
        val dist = math.min(frac, 1.0 - frac)
        assert(dist > 1e-3,
          f"rel=$rel rank=$rank: term $scaled%.6f sits $dist%.2e from an " +
            "integer boundary — floor could flip across libms")
      }
    }
    // and the gate query's own terms: replay q187's (rel, rank) pairs
    // through Retrieval.ndcg's actual expression vs a pure-JVM replay
    val docs = graft.queries.Tables
      .load(spark, "/root/testdata/sf0.01", "documents")
    val ranking = graft.ext.Index.build(docs, "text", "doc_id")
      .search(Seq("dup", "data"), k = 10).select($"doc_id", $"score_nano")
    val judged = docs
      .select($"doc_id", graft.functions.TextFns.tokens($"text").as("toks"))
      .select($"doc_id",
        (lit(2L) * array_contains($"toks", "dup").cast("long") +
          array_contains($"toks", "data").cast("long")).as("rel"))
    val got = graft.ext.Retrieval
      .ndcg(ranking, judged, "doc_id", "score_nano", "rel", k = 10)
      .as[(Long, Long, Long)].head()
    def jvmTerm(rel: Long, rank: Long): Long =
      if (((rank + 1) & rank) == 0L)
        ((1L << rel) - 1L) * 1000000L /
          math.round(math.log(rank + 1.0) / math.log(2.0))
      else math.floor((math.pow(2.0, rel.toDouble) - 1.0) *
        math.log(2.0) / math.log(rank + 1.0) * 1000000.0).toLong
    val relOf = judged.as[(Long, Long)].collect().toMap
    val rankedIds = ranking.orderBy($"score_nano".desc, $"doc_id".asc)
      .limit(10).select($"doc_id").as[Long].collect()
    val dcg = rankedIds.zipWithIndex
      .map { case (id, i) => jvmTerm(relOf.getOrElse(id, 0L), i + 1L) }.sum
    val idealRels = judged.orderBy($"rel".desc, $"doc_id".asc).limit(10)
      .select($"rel").as[Long].collect()
    val idcg = idealRels.zipWithIndex
      .map { case (r, i) => jvmTerm(r, i + 1L) }.sum
    assert(got._1 === dcg, "dcg_micro drifted from the JVM replay")
    assert(got._2 === idcg, "idcg_micro drifted from the JVM replay")
    assert(got._3 === (if (idcg > 0) dcg * 1000000L / idcg else 0L))
  }

  test("mmrSelect: bidirectional duplicate sims don't defeat the absent=0 floor") {
    // Round 3 has chosen = {1, 4}. Candidate 2's ONLY recorded pair
    // (to 1, negative) arrives in BOTH directions: before the sym
    // dedupe that doubled npres to 2 == nChosen, fooling the
    // completeness guard into letting −80 stand (score 385 + 240 =
    // 625 → 2 would beat 3). With dedupe, npres = 1 < 2 → the absent
    // (2,4) pair contributes its 0 → maxsim = 0 → 2 scores 385 and 3
    // (both pairs recorded, sim 5) wins with 398.
    val cand = Seq((1L, 100L), (4L, 95L), (2L, 55L), (3L, 59L))
      .toDF("id", "rel")
    val sims = Seq((2L, 1L, -80L), (1L, 2L, -80L),
      (3L, 1L, 5L), (3L, 4L, 5L)).toDF("a", "b", "sim")
    val got = graft.ext.Retrieval
      .mmrSelect(cand, sims, "id", "rel", k = 3, lamNum = 7, lamDen = 10)
      .orderBy($"rank")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 100L, 0L, 700L),
      (2L, 4L, 95L, 0L, 665L),
      (3L, 3L, 59L, 5L, 398L)))
  }

  test("candidateSims == banded blocker over the semi-joined candidates") {
    // the helper must produce exactly bandedScoredPairs' (ia, ib,
    // cos_bp) restricted to the candidate list, renamed (a, b, sim)
    val emb = graft.queries.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    val cand = emb.filter($"vec_id" < 40).select($"vec_id".as("id"))
    val got = graft.ext.Retrieval
      .candidateSims(emb, cand, "embedding", "vec_id")
      .as[(Long, Long, Long)].collect().toSet
    val want = graft.ext.VectorIndex
      .bandedScoredPairs(emb.filter($"vec_id" < 40), "embedding", "vec_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
    // all pair endpoints are candidates
    assert(got.forall { case (a, b, _) => a < 40 && b < 40 && a < b })
  }

  test("dendrogram levels == brute union-find at every cut; monotone") {
    // random dim-4 vectors; levels cut the FULL pair graph (no
    // blocking here — the query's bucket blocking is its own recall
    // knob, the level math is what this pins)
    val rnd = new scala.util.Random(555)
    val vecs = (0L until 30L).map(i =>
      i -> Array.fill(4)(rnd.nextFloat() * 2f - 1f))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      d / (na * nb)
    }
    val pairs = for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
    } yield (i.toLong, j.toLong,
      math.floor(cos(vecs(i)._2, vecs(j)._2) * 10000.0 + 0.5).toLong)
    def bruteLevel(tau: Long): (Long, Long, Long) = {
      val parent = scala.collection.mutable.Map((0L until 30L).map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      pairs.filter(_._3 >= tau).foreach { case (a, b, _) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
      }
      val comps = (0L until 30L).groupBy(find)
      (comps.size.toLong, comps.values.count(_.size == 1).toLong,
        comps.values.map(_.size).max.toLong)
    }
    import graft.ext.TextDedup
    val pairsDf = pairs.toDF("ia", "ib", "cos_bp").localCheckpoint()
    val nodes = (0L until 30L).toDF("id")
    val taus = Seq(5000L, 2000L, 0L)
    val got = taus.map { tau =>
      val comp = TextDedup.connectedComponents(
        pairsDf.filter($"cos_bp" >= tau), nodes, "ia", "ib", "id")
      val sizes = comp.groupBy($"component").agg(count(lit(1)).as("sz"))
        .as[(Long, Long)].collect()
      (sizes.length.toLong, sizes.count(_._2 == 1L).toLong, sizes.map(_._2).max)
    }
    assert(got === taus.map(bruteLevel))
    // dendrogram monotonicity: loosening the cut only merges
    assert(got.map(_._1).sliding(2).forall(w => w(0) >= w(1)), s"$got")
    assert(got.map(_._3).sliding(2).forall(w => w(0) <= w(1)), s"$got")
  }

  // ------------------------------------------------------------------
  // Product quantization

  private def brutePq(vecs: Seq[(Long, Array[Float])], m: Int, k: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    val dim = vecs.head._2.length
    val dsub = dim / m
    (0 until m).map { j =>
      def sub(v: Array[Float]): Array[Double] =
        v.slice(j * dsub, (j + 1) * dsub).map(_.toDouble)
      var cents = vecs.sortBy(_._1).take(k).map(x => sub(x._2)).toArray
      def assign(v: Array[Double]): Int =
        cents.zipWithIndex.map { case (c, i) =>
          (c.zip(v).map { case (cv, x) => val d = x - cv; d * d }
            .reduceLeft(_ + _), i)
        }.min._2
      (0 until iters).foreach { _ =>
        val groups = vecs.map(x => (assign(sub(x._2)), sub(x._2)))
          .groupBy(_._1)
        val upd = cents.clone()
        groups.foreach { case (cell, vs) =>
          val n = vs.size.toDouble
          upd(cell) = (0 until dsub).map(t =>
            (vs.map(_._2(t)).sum / n).toFloat.toDouble).toArray
        }
        cents = upd
      }
      cents
    }.toArray
  }

  test("PQ encode/search == brute-force reimplementation; partition-proof") {
    val rnd = new scala.util.Random(1234)
    val vecs = (0L until 40L).map { i =>
      // 4 natural clusters so the codebook is meaningful
      val base = (i % 4).toInt
      i -> Array.tabulate(8)(t => base * 10f + t + rnd.nextFloat() * 0.5f)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cb = graft.ext.VectorIndex
      .pqTrain(df, "embedding", "vec_id", m = 2, k = 4, iterations = 3)
    val cbBrute = brutePq(vecs, m = 2, k = 4, iters = 3)
    assert(cb.map(_.map(_.toSeq).toSeq).toSeq ===
      cbBrute.map(_.map(_.toSeq).toSeq).toSeq, "codebooks differ")

    // same codebook from a different partitioning (float-rounded means
    // absorb partial-agg summation-order noise)
    val cb2 = graft.ext.VectorIndex
      .pqTrain(df.repartition(7), "embedding", "vec_id", m = 2, k = 4,
        iterations = 3)
    assert(cb2.map(_.map(_.toSeq).toSeq).toSeq ===
      cb.map(_.map(_.toSeq).toSeq).toSeq, "codebook depends on partitioning")

    // encode == brute argmin
    def bruteAssign(v: Array[Double], cents: Array[Array[Double]]): Int =
      cents.zipWithIndex.map { case (c, i) =>
        (c.zip(v).map { case (cv, x) => val d = x - cv; d * d }
          .reduceLeft(_ + _), i)
      }.min._2
    val codes = graft.ext.VectorIndex
      .pqEncode(df, "embedding", "vec_id", cb)
      .as[(Long, Seq[Int])].collect().toMap
    vecs.foreach { case (id, v) =>
      val expect = (0 until 2).map(j => bruteAssign(
        v.slice(j * 4, (j + 1) * 4).map(_.toDouble), cb(j)))
      assert(codes(id) === expect, s"code mismatch for $id")
    }

    // search == brute LUT sum, and it finds the query's own cluster
    val q = vecs(6)._2.map(_.toDouble) // cluster 2
    val lut = cb.zipWithIndex.map { case (cents, j) =>
      cents.map { c =>
        val d2 = c.zipWithIndex.map { case (cv, t) =>
          val d = q(j * 4 + t) - cv; d * d
        }.reduceLeft(_ + _)
        math.floor(d2 * 1000000.0).toLong
      }
    }
    val expectTop = vecs.map { case (id, _) =>
      id -> (0 until 2).map(j => lut(j)(codes(id)(j))).sum
    }.sortBy { case (id, d) => (d, id) }.take(5)
    val got = graft.ext.VectorIndex
      .pqSearch(graft.ext.VectorIndex.pqEncode(df, "embedding", "vec_id", cb),
        "vec_id", cb, q, k = 5)
      .as[(Long, Long)].collect().toSeq
    assert(got === expectTop)
    assert(got.forall(_._1 % 4 == 2), s"top-5 must be the query's cluster: $got")
  }

  // ------------------------------------------------------------------
  // personalizedPageRank

  private def brutePpr(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = deg.keySet ++ seeds
    val ns = seeds.size.toLong
    val rst = nodes.map(v =>
      v -> (if (seeds(v)) 150000000000L / ns else 0L)).toMap
    var r = nodes.map(v =>
      v -> (if (seeds(v)) 1000000000000L / ns else 0L)).toMap
    for (_ <- 0 until iters) {
      val acc = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s, d) =>
        if (r.contains(s) && deg.getOrElse(s, 0L) > 0)
          acc(d) += r(s) / deg(s)
      }
      r = nodes.map(v => v -> (rst(v) + (85L * acc(v)) / 100L)).toMap
    }
    r
  }

  test("personalizedPageRank == brute-force integer simulation (3 rounds)") {
    val raw = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L),
      (4L, 5L), (5L, 4L), (1L, 5L), (5L, 1L), (6L, 1L), (1L, 6L))
    val seeds = Set(1L, 9L) // 9 has NO edges — full-outer universe path
    val expected = brutePpr(raw, seeds, 3)
    val got = Graph.personalizedPageRank(
        raw.toDF("src", "dst"), seeds.toSeq.toDF("node"),
        maxIterations = 3, checkConvergence = false)
      .select($"node", $"r").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("personalizedPageRank: self-loop seed is stationary (early stop == fixed)") {
    // a seed with only a self-loop keeps its full mass: 0.15·10¹² +
    // 0.85·10¹² = 10¹² exactly, so round 1 IS the fixpoint — the
    // convergence probe must stop there and match the fixed-round path
    // (true integer fixpoints generally need ~170 rounds — 0.85^n·10¹²
    // must underflow — so this is the cheap stationary instance, the
    // pageRank ring-test technique)
    val loop = Seq((1L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val fast = Graph.personalizedPageRank(loop, seeds, maxIterations = 20)
      .select($"node", $"r").as[(Long, Long)].collect().toMap
    val fixed = Graph.personalizedPageRank(loop, seeds, maxIterations = 3,
        checkConvergence = false)
      .select($"node", $"r").as[(Long, Long)].collect().toMap
    assert(fast === Map(1L -> 1000000000000L))
    assert(fixed === fast)
  }
}
