package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.queries.{Extended9, Tables}

/** Round-8 batch (q141–q146): oracle hash-parity is the correctness
  * gate; these pin plan shapes and the invariants the oracle can't see.
  */
class Extended9Spec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"

  test("q141: no near-dup component ever straddles a split boundary") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val pairs = graft.ext.TextDedup
      .lshCandidates(docs, "text", "doc_id", ngram = 3, numHashes = 4,
        bands = 1)
    val cc = graft.ext.TextDedup
      .connectedComponents(pairs, docs.select($"doc_id"), nodeCol = "doc_id")
      .select($"node", $"component",
        graft.operators.HashSplit.assign($"component",
          Seq("train" -> 8, "val" -> 1, "test" -> 1)).as("split"))
    val straddlers = cc.groupBy($"component")
      .agg(countDistinct($"split").as("n_splits"))
      .filter($"n_splits" > 1).count()
    assert(straddlers === 0L, "leakage: a cluster crosses the split wall")
    // the summary conserves docs and components
    val rows = Extended9.q141(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    assert(rows.map(_.getAs[Long]("n_components")).sum ===
      cc.select($"component").distinct().count())
  }

  test("q142: winner has max count, ties break to smallest label") {
    import spark.implicits._
    val rows = Extended9.q142(spark, dir).collect()
    assert(rows.nonEmpty)
    // brute-force replay per item
    val votes = Tables.load(spark, dir, "events")
      .select(($"event_id" % 500).as("item"), $"event_type".as("vote"))
      .as[(Long, String)].collect()
      .groupBy(_._1).map { case (item, vs) =>
        val counts = vs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val maxc = counts.values.max
        val winner = counts.filter(_._2 == maxc).keys.min
        item -> (winner, maxc, vs.size.toLong)
      }
    rows.foreach { r =>
      val (winner, maxc, n) = votes(r.getAs[Long]("item"))
      assert(r.getAs[String]("winner") === winner)
      assert(r.getAs[Long]("win_votes") === maxc)
      assert(r.getAs[Long]("agreement_ppm") === maxc * 1000000L / n)
    }
  }

  test("q143: grid join plan has NO nested-loop/cartesian; results == naive") {
    import spark.implicits._
    val df = Extended9.q143(spark, dir)
    val plan = df.queryExecution.executedPlan
    val bad = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(bad.isEmpty, s"interval join fell back to a product plan:\n$plan")
    // brute-force parity at this SF
    val iv = Tables.load(spark, dir, "events")
      .filter($"event_type" === "error" && $"event_id" % 7 === 0)
      .select($"event_id".as("id"), unix_timestamp($"ts").as("st"))
      .withColumn("en", $"st" + ($"id" % 120 + 5) * 60)
      .as[(Long, Long, Long)].collect()
    val naive = (for {
      (ia, sa, ea) <- iv; (ib, sb, eb) <- iv
      if ia < ib && sa <= eb && sb <= ea
    } yield (ia, ib, math.min(ea, eb) - math.max(sa, sb))).sortBy(x => (x._1, x._2))
    val got = df.as[(Long, Long, Long)].collect().toSeq
    assert(got === naive.toSeq)
  }

  test("q144: coverage + oov == 1e6 and the vocab is exactly top-100") {
    val rows = Extended9.q144(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("coverage_ppm") + r.getAs[Long]("oov_ppm")
        === 1000000L)
      assert(r.getAs[Long]("in_vocab") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("q145: zero false negatives vs brute-force containment") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val sets = docs
      .select($"doc_id", array_distinct(
        TextFns.ngramsFromTokens(TextFns.tokens($"text"), 3)).as("ng"))
      .as[(Long, Seq[String])].collect()
    val naive = (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia != ib
      inter = sa.toSet.intersect(sb.toSet).size
      if inter * 5 >= sa.size * 4
    } yield (ia, ib, inter.toLong, sa.size.toLong)).sortBy(x => (x._1, x._2))
    val got = Extended9.q145(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === naive.toSeq, "prefix filter dropped a qualifying pair")
  }

  test("q146: decay is monotone and anchor-week events keep full value") {
    import spark.implicits._
    val rows = Extended9.q146(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("decayed_cents") <= r.getAs[Long]("raw_cents"))
      assert(r.getAs[Long]("decayed_cents") >= 0L)
    }
    // an event in the final week (wk = 0) contributes cents unshifted:
    // recompute one user's score by hand
    val ev = Tables.load(spark, dir, "events")
      .select($"user_id", unix_timestamp($"ts").as("et"),
        floor($"value" * 100 + 0.5).cast("long").as("cents"))
      .as[(Long, Long, Long)].collect()
    val anchor = ev.map(_._2).max
    val u = ev.head._1
    val want = ev.filter(_._1 == u).map { case (_, et, c) =>
      c >> math.min((anchor - et) / 604800L, 40L).toInt
    }.sum
    val got = rows.find(_.getAs[Long]("user_id") == u).get
      .getAs[Long]("decayed_cents")
    assert(got === want)
  }
}
