package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.queries.{Extended7, Tables}

/** Fourth round-7 batch (q130–q137): oracle hash-parity is the
  * correctness gate; these pin plan shapes and the invariants the
  * oracle can't see.
  */
class Extended7Spec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"

  test("q130: per-doc NLL replays the ln formula exactly (first doc)") {
    import spark.implicits._
    val rows = Extended7.q130(spark, dir).collect()
    // token accounting: every corpus token lands in exactly one doc row
    val toks = Tables.load(spark, dir, "documents")
      .select($"doc_id", explode(TextFns.tokens($"text")).as("tok"))
    val corpusToks = toks.count()
    assert(rows.map(_.getAs[Long]("n_toks")).sum === corpusToks)
    assert(rows.forall(_.getAs[Long]("nll_sum_micro") >= 0L))
    // brute-force replay for one doc: same floor-scaled micro-nat math
    val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val d0 = toks.filter($"doc_id" === 0).as[(Long, String)].collect()
    val expected = d0.map { case (_, tok) =>
      math.floor((math.log(corpusToks.toDouble) -
        math.log(vocab(tok).toDouble)) * 1000000.0).toLong
    }.sum
    val got = rows.find(_.getAs[Long]("doc_id") == 0L).get
    assert(got.getAs[Long]("nll_sum_micro") === expected)
    assert(got.getAs[Long]("nll_avg_micro") === expected / d0.length)
  }

  test("q130: floor((ln n - ln cnt)*1e6) has a guard band at every " +
      "integer boundary") {
    import spark.implicits._
    // Oracle hash parity needs JVM Math.log and DuckDB's libm ln to
    // floor to the SAME integer. They agree to ~1 ulp, which only
    // matters if a scaled value sits adjacent to an integer — so prove
    // no value in the test vocabulary does. A 1e-3 guard band is ~1e9×
    // the worst-case cross-libm divergence at this magnitude (ulp of
    // 2e7 ≈ 4e-9); residual risk on OTHER corpora is documented in
    // NOTES.md (the floor scale is a knob, not a constant of nature).
    val toks = Tables.load(spark, dir, "documents")
      .select(explode(TextFns.tokens($"text")).as("tok"))
    val n = toks.count().toDouble
    val counts = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect()
    assert(counts.nonEmpty)
    val dists = counts.map { case (_, cnt) =>
      val scaled = (math.log(n) - math.log(cnt.toDouble)) * 1000000.0
      val frac = scaled - math.floor(scaled)
      math.min(frac, 1.0 - frac)
    }
    assert(dists.min > 1e-3,
      f"scaled micro-nat within ${dists.min}%.2e of an integer boundary " +
        "— floor() could flip across libms; coarsen the scale")
  }

  test("q131: dims broadcast, fact joins shuffle, output is ASIA-only") {
    import spark.implicits._
    val df = Extended7.q131(spark, dir)
    val plan = df.queryExecution.executedPlan
    // BroadcastHashJoinExec ONLY: the star dims are equi-joins, so a
    // BNLJ here would mean a lost join key (a real plan regression),
    // not an acceptable broadcast
    val bhj = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.size >= 3, s"expected supplier/nation/region broadcasts:\n$plan")
    // ASIA = regionkey 2; generator maps nationkey -> regionkey = key % 5
    val asiaNations = Tables.load(spark, dir, "nation")
      .filter($"n_regionkey" === 2).select($"n_name").as[String].collect().toSet
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("n_name")).toSet.subsetOf(asiaNations))
  }

  test("q132: recursive scaffold is gapless and conserves event counts") {
    import spark.implicits._
    val rows = Extended7.q132(spark, dir).collect()
    val days = rows.map(_.getAs[java.sql.Date]("day").toLocalDate)
    val span = java.time.temporal.ChronoUnit.DAYS
      .between(days.head, days.last).toInt + 1
    assert(rows.length === span, "one row per calendar day, no gaps")
    assert(days.toSeq === days.sorted.toSeq)
    val filtered = Tables.load(spark, dir, "events")
      .filter($"event_type" === "error" && $"event_id" % 97 === 0).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum === filtered)
  }

  test("q133: variant schema is pinned; missing-path probe stays NULL") {
    val rows = Extended7.q133(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("vschema") ===
        "OBJECT<arr: ARRAY<BIGINT>, p: OBJECT<k: BIGINT>, t: STRING>")
      assert(r.getAs[Long]("n_missing") === 0L)
    }
  }

  test("q134: ranks are positive, strictly ordered, and supplier-heavy") {
    val rows = Extended7.q134(spark, dir).collect()
    assert(rows.length === 20)
    val ranks = rows.map(_.getAs[Long]("rank_ppt"))
    assert(ranks.forall(_ > 0L))
    val keys = rows.map(r => (-r.getAs[Long]("rank_ppt"), r.getAs[Long]("node")))
    assert(keys.toSeq === keys.sorted.toSeq, "deterministic (rank desc, node)")
    // suppliers aggregate the mass of hundreds of parts — the head of
    // the ranking must be supplier nodes
    assert(rows.take(5).forall(_.getAs[Long]("is_supp") === 1L))
  }

  test("q135: multi-probe shortlist ⊇ single-bucket shortlist; sims exact") {
    import spark.implicits._
    val e = Tables.load(spark, dir, "embeddings")
      .withColumn("bucket", graft.functions.VectorFns.signBucket($"embedding", 8))
    val qb = e.filter($"vec_id" === 0).select($"bucket").as[Long].head()
    val single = e.filter($"bucket" === qb && $"vec_id" =!= 0).count()
    val multi = e.filter($"vec_id" =!= 0)
      .filter((0 to 8).map {
        case 0 => $"bucket" === qb
        case i => $"bucket" === (qb ^ (1L << (i - 1)))
      }.reduce(_ || _)).count()
    assert(multi >= single)
    // every returned sim must equal the exact cosine for that vec_id
    val got = Extended7.q135(spark, dir).collect()
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val exact = e.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id",
        round(graft.functions.VectorFns.cosine($"embedding", $"qvec"), 4)
          .as("cos_sim"))
      .as[(Long, Double)].collect().toMap
    got.foreach { r =>
      assert(exact(r.getAs[Long]("vec_id")) === r.getAs[Double]("cos_sim"))
    }
  }

  test("q136: five negatives per query, never from the query's source") {
    import spark.implicits._
    val rows = Extended7.q136(spark, dir).collect()
    val perQuery = rows.groupBy(_.getAs[Long]("q_id"))
    assert(perQuery.values.forall(_.length === 5))
    assert(perQuery.values.forall(_.map(_.getAs[Int]("rk")).sorted.toSeq
      === Seq(1, 2, 3, 4, 5)))
    val src = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    rows.foreach { r =>
      assert(src(r.getAs[Long]("q_id")) !== src(r.getAs[Long]("neg_id")))
    }
  }

  test("q137: batches respect the budget modulo one overhang; mass conserved") {
    import spark.implicits._
    val budget = 2000L
    val rows = Extended7.q137(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("bucket")).distinct.sorted.toSeq === (1 to 10))
    rows.foreach { r =>
      assert(r.getAs[Long]("batch_tokens") <
        budget + r.getAs[Long]("max_len"),
        s"batch ${r.getAs[Int]("bucket")}/${r.getAs[Long]("batch_id")} overflow")
      assert(r.getAs[Long]("min_len") <= r.getAs[Long]("max_len"))
    }
    val corpusToks = Tables.load(spark, dir, "documents")
      .select(size(TextFns.tokens($"text")).cast("long")).as[Long]
      .collect().sum
    assert(rows.map(_.getAs[Long]("batch_tokens")).sum === corpusToks)
  }
}
