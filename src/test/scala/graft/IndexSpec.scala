package graft

import org.apache.spark.sql.functions._

import graft.ext.Index

/** ext/Index (build → search BM25 retrieval) contracts:
  *
  *  - uncapped search reproduces q111's scoring exactly on the sf0.001
  *    documents table (same terms, same top-k — the operator IS the
  *    query's scoring path, promoted);
  *  - capped postings: evicted docs score 0 on the evicted term while
  *    df/cf stay TRUE corpus stats (capped survivors' scores equal
  *    their uncapped scores);
  *  - brute-force BM25 golden on a hand corpus.
  */
class IndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("uncapped Index.search == q111 scoring on sf0.001 documents") {
    val docs = graft.queries.Tables.load(spark, sfDir, "documents")
    val idx = Index.build(docs, "text", "doc_id")
    val got = idx.search(Seq("the", "data", "model", "system"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = graft.queries.Extended4.q111(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("brute-force BM25 golden on a hand corpus") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "data model data"),
      (2L, "the system"),
      (3L, "data data data data"),
      (4L, "other words entirely"))
    val df = corpus.toDF("doc_id", "text")
    val idx = Index.build(df, "text", "doc_id")
    assert(idx.nDocs === 4L)
    assert(idx.sumDl === 12L)
    val got = idx.search(Seq("data", "system"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // brute force mirroring the operator: floor-nano per (doc, term),
    // BIGINT sum, (score desc, doc asc)
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    def score(terms: Seq[String]): Seq[(Long, Long, Long)] = toks.flatMap {
      case (id, ts) =>
        val dl = ts.size.toDouble
        val matched = terms.flatMap { term =>
          val tf = ts.count(_ == term).toDouble
          if (tf == 0) None
          else {
            val df0 = toks.count(_._2.contains(term)).toDouble
            val idf = math.log(1.0 + (n - df0 + 0.5) / (df0 + 0.5))
            val tfn = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
            Some(math.floor(idf * tfn * 1e9).toLong)
          }
        }
        if (matched.isEmpty) None
        else Some((id, matched.sum, matched.size.toLong))
    }.sortBy(t => (-t._2, t._1))
    assert(got === score(Seq("data", "system")))
  }

  test("postingCap evicts high-doc-id postings; survivors score unchanged") {
    val s = spark
    import s.implicits._
    // "data" appears in docs 1..5; cap 3 keeps docs 1,2,3 in its
    // posting list. "rare" (doc 5 only) survives any cap.
    val df = (1L to 5L).map(i =>
        (i, if (i == 5L) "data rare" else "data common"))
      .toDF("doc_id", "text")
    val uncapped = Index.build(df, "text", "doc_id")
    val capped = Index.build(df, "text", "doc_id", postingCap = Some(3))
    // TRUE df survives the cap
    val dfOf = capped.dictionary.filter(col("token") === "data")
      .head().getLong(1)
    assert(dfOf === 5L)
    val u = uncapped.search(Seq("data"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val c = capped.search(Seq("data"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(c.keySet === Set(1L, 2L, 3L), "evicted docs must not score")
    c.foreach { case (id, sc) =>
      assert(sc === u(id), s"survivor $id must score as uncapped")
    }
    // the rare term still finds doc 5 (its posting is under the cap)
    val rare = capped.search(Seq("rare"), k = 10).collect().map(_.getLong(0))
    assert(rare.toSeq === Seq(5L))
  }

  test("bucketed postings: probe prunes to the terms' buckets, no token exchange") {
    val docs = graft.queries.Tables.load(spark, sfDir, "documents")
    val built = Index.build(docs, "text", "doc_id")
    val bucketed = Index.writeBucketed(built, spark, "idx_spec_bucketed",
      numBuckets = 8)
    built.unpersist()
    val terms = Seq("data", "dup")
    val q = bucketed.search(terms, k = 5)
    // results bit-identical to the in-memory index
    val mem = Index.build(docs, "text", "doc_id").search(terms, k = 5)
    assert(q.collect().map(_.toSeq).toSeq === mem.collect().map(_.toSeq).toSeq)
    val plan = q.queryExecution.executedPlan.toString
    // bucket pruning is load-bearing: the postings scan must report a
    // selected-bucket count bounded by the probe's term count
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning in postings scan:\n$plan")
    assert(sel.get.group(1).toInt <= terms.size &&
      sel.get.group(2).toInt === 8,
      s"expected <=${terms.size} of 8 buckets, got ${sel.get.matched}")
    // the only exchange is the doc_id aggregation — never one on token
    assert(!plan.contains("hashpartitioning(token"),
      s"postings must not re-shuffle on token:\n$plan")
  }

  test("writeBucketed: rewrite-then-reopen is consistent; name is validated") {
    // the single-writer contract's observable half: after a second
    // writeBucketed under the SAME name (stale catalog tables + stale
    // managed paths from the first), a fresh loadBucketed sees frames
    // consistent with the latest build — counts, corpus scalars, and
    // search results all from write #2's corpus
    val docs = graft.queries.Tables.load(spark, sfDir, "documents")
    val b1 = Index.build(docs.limit(40), "text", "doc_id")
    Index.writeBucketed(b1, spark, "idx_spec_rewrite", numBuckets = 4)
    b1.unpersist()
    val b2 = Index.build(docs, "text", "doc_id")
    val w2 = Index.writeBucketed(b2, spark, "idx_spec_rewrite", numBuckets = 4)
    val mem = b2.search(Seq("data", "dup"), k = 5).collect().map(_.toSeq).toSeq
    b2.unpersist()
    val reopened = Index.loadBucketed(spark, "idx_spec_rewrite")
    assert(reopened.nDocs === w2.nDocs && reopened.sumDl === w2.sumDl)
    assert(reopened.search(Seq("data", "dup"), k = 5)
      .collect().map(_.toSeq).toSeq === mem,
      "reopened index diverged from the latest build")
    // `name` rides into DROP TABLE sql and a filesystem path — bare
    // identifiers only
    val e = intercept[IllegalArgumentException] {
      Index.writeBucketed(reopened, spark, "bad name; DROP TABLE x")
    }
    assert(e.getMessage.contains("bare SQL identifier"))
  }
}
