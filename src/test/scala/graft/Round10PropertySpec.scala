package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ext.{BloomSketch, Retrieval, TextDedup}

/** Randomized property coverage for the round-10 shelves — fixed-seed
  * ScalaCheck generators (the PropertySpec technique) driving each
  * operator against an independent in-memory brute force:
  *
  *  - longestCommonSpan == DP token-LCS on random small-vocab corpora
  *    (small vocab ⇒ dense accidental overlaps — the adversarial case
  *    for the diagonal-islands method);
  *  - rbo == brute RBO on random ranked lists, every k and both
  *    non-default p values the guard admits;
  *  - ndcg == brute graded DCG on random judgments (including docs
  *    ranked but unjudged and judged but unranked);
  *  - bloom: NO false negative across random key sets and sizings, and
  *    prunedAntiJoin ≡ plain anti join even at deliberately tiny m
  *    (high FP pressure — correctness must not depend on FP rate).
  */
class Round10PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))

  // ------------------------------------------------------------------

  private def lcsTokens(x: String, y: String): Int = {
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

  test("longestCommonSpan == DP LCS on random 4-token-vocab corpora") {
    val docGen = Gen.chooseNum(6, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    val corpusGen = Gen.listOfN(8, docGen)
    samples(corpusGen, 4, 4242L).zipWithIndex.foreach { case (texts, ci) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val pairs = for {
        i <- docs.indices; j <- (i + 1) until docs.length
      } yield (i.toLong, j.toLong)
      val k = 3
      val got = TextDedup
        .longestCommonSpan(pairs.toDF("a", "b"), docs.toDF("doc_id", "text"),
          "text", "doc_id", k = k)
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val m = docs.toMap
      pairs.foreach { case (a, b) =>
        val brute = lcsTokens(m(a), m(b))
        val expect = if (brute >= k) brute.toLong else 0L
        assert(got((a, b)) === expect,
          s"corpus $ci pair ($a,$b): brute=$brute got=${got((a, b))}")
      }
    }
  }

  // ------------------------------------------------------------------

  private def bruteRanks(l: Seq[(Long, Long)]): Map[Long, Long] =
    l.sortBy { case (id, sc) => (-sc, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap

  test("rbo == brute RBO on random lists across k and p") {
    val listGen = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 15L), Gen.chooseNum(0L, 5L))))
      .map(_.distinctBy(_._1))
    val cases = samples(Gen.zip(listGen, listGen), 5, 777L)
    for (((la, lb), ci) <- cases.zipWithIndex;
         (k, pn, pd) <- Seq((3, 9, 10), (7, 1, 2), (10, 9, 10))) {
      val ra = bruteRanks(la).filter(_._2 <= k)
      val rb = bruteRanks(lb).filter(_._2 <= k)
      val ms = (ra.keySet & rb.keySet).toSeq
        .map(id => math.max(ra(id), rb(id)))
      val expect = (1 to k).map { d =>
        val overlap = ms.count(_ <= d).toLong
        overlap * (pd - pn) * BigInt(pn).pow(d - 1).toLong * 1000000000L /
          (BigInt(pd).pow(d).toLong * d)
      }.sum
      val got = Retrieval.rbo(la.toDF("id", "score"), lb.toDF("id", "score"),
          "id", "score", k = k, pNum = pn, pDen = pd)
        .as[(Option[Long], Long)].head()
      assert(got._2 === expect, s"case $ci k=$k p=$pn/$pd")
    }
  }

  test("ndcg == brute graded DCG on random judgments") {
    def term(rel: Long, rank: Long): Long =
      math.floor((math.pow(2.0, rel.toDouble) - 1.0) * math.log(2.0) /
        math.log(rank.toDouble + 1.0) * 1000000.0).toLong
    val rankGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 12L), Gen.chooseNum(0L, 9L))))
      .map(_.distinctBy(_._1))
    val judgGen = Gen.chooseNum(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 12L), Gen.chooseNum(0L, 3L))))
      .map(_.distinctBy(_._1))
    samples(Gen.zip(rankGen, judgGen), 6, 31337L).zipWithIndex.foreach {
      case ((ranking, judgments), ci) =>
        val k = 5
        val jm = judgments.toMap
        val ranks = bruteRanks(ranking).filter(_._2 <= k)
        val dcg = ranks.map { case (id, r) =>
          term(jm.getOrElse(id, 0L), r)
        }.sum
        val ideal = judgments.sortBy { case (id, rel) => (-rel, id) }.take(k)
        val idcg = ideal.zipWithIndex.map { case ((_, rel), i) =>
          term(rel, i + 1L)
        }.sum
        val expect = (dcg, idcg, if (idcg > 0) dcg * 1000000L / idcg else 0L)
        val got = Retrieval.ndcg(ranking.toDF("id", "score"),
            judgments.toDF("id", "rel"), "id", "score", "rel", k = k)
          .as[(Long, Long, Long)].head()
        assert(got === expect, s"case $ci")
    }
  }

  // ------------------------------------------------------------------

  test("bloom: no false negative and pruned == exact under FP pressure") {
    val keysGen = Gen.chooseNum(20, 120).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 500L))).map(_.distinct)
    samples(Gen.zip(keysGen, keysGen), 4, 90210L).zipWithIndex.foreach {
      case ((dimKeys, factKeys), ci) =>
        // 128 bits for up to ~120 keys: FP rate is ENORMOUS on purpose
        val numBits = 128
        val dim = dimKeys.toDF("k")
        val fact = factKeys.toDF("fk")
        val bloom = broadcast(BloomSketch.packed(
          BloomSketch.addAll(dim, "k", numBits, 3), numBits))
        val fn = dim.crossJoin(bloom)
          .filter(!BloomSketch.mightContain($"k", $"bloom", numBits, 3))
          .count()
        assert(fn === 0L, s"case $ci: member probed false")
        val exact = fact.join(dim.select($"k".as("fk")), Seq("fk"), "left_anti")
          .as[Long].collect().toSet
        val pruned = BloomSketch
          .prunedAntiJoin(fact, "fk", dim, "k", numBits, 3)
          .as[Long].collect().toSet
        assert(pruned === exact, s"case $ci: pruned != exact")
    }
  }
}
