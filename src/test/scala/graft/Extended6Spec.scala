package graft

import org.apache.spark.sql.functions._

import graft.queries.{Extended6, Tables}

/** Curation-observability batch (q126–q129): oracle hash-parity is the
  * correctness gate; these pin the structural invariants.
  */
class Extended6Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q126: funnel is monotone non-increasing and bounded by the corpus") {
    val rows = Extended6.q126(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("stage")).toSeq === Seq(1, 2, 3, 4))
    val passes = rows.map(_.getAs[Long]("n_pass"))
    assert(passes.zip(passes.tail).forall { case (a, b) => a >= b })
    val total = Tables.load(spark, dir, "documents").count()
    assert(passes.head <= total)
    assert(rows.forall(r => r.getAs[Long]("pass_ppm") <= 1000000L))
  }

  test("q127: histogram accounts for every document exactly once") {
    val rows = Extended6.q127(spark, dir).collect()
    val total = Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    rows.foreach { r =>
      assert(r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters")
        === r.getAs[Long]("n_docs"))
    }
  }

  test("q128: grouped expansion matches the brute-force pair join") {
    import spark.implicits._
    val sh = Tables.load(spark, dir, "documents")
      .withColumn("toks", graft.functions.TextFns.tokens($"text"))
      .select($"source",
        explode(array_distinct(
          graft.functions.TextFns.ngramsFromTokens($"toks", 5))).as("ng"))
      .distinct()
    val expected = sh.as("a")
      .join(sh.as("b"), $"a.ng" === $"b.ng" && $"a.source" < $"b.source")
      .groupBy($"a.source".as("source_a"), $"b.source".as("source_b"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .orderBy($"source_a", $"source_b")
      .collect()
    assert(Extended6.q128(spark, dir).collect() === expected)
  }

  test("q129: kept mass is ≤ 80% of source mass and maximal") {
    import spark.implicits._
    val kept = Extended6.q129(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("chars_kept"))).toMap
    val docs = Tables.load(spark, dir, "documents")
      .select($"source", $"n_chars", $"doc_id")
      .collect()
      .groupBy(_.getAs[String]("source"))
    docs.foreach { case (src, rows) =>
      val sorted = rows.map(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
        .sortBy { case (c, id) => (-c, id) }
      val tot = sorted.map(_._1).sum
      val (nKept, charsKept) = kept.getOrElse(src, (0L, 0L))
      assert(charsKept * 5 <= tot * 4, s"$src: kept mass exceeds 80%")
      if (nKept < sorted.length) {
        val nextMass = charsKept + sorted(nKept.toInt)._1
        assert(nextMass * 5 > tot * 4, s"$src: selection not maximal")
      }
    }
  }
}
