package graft

import org.apache.spark.sql.functions._

/** Round-14 batch invariants the oracle can't see: hand-computed
  * read-outs on closed-form fixtures for the Gini / Chao1 / chunking /
  * burstiness arithmetic.
  */
class Extended24Spec extends SparkSpec {

  test("gini arithmetic: uniform corpus reads 0; one-doc-has-everything " +
    "approaches (n-1)/n") {
    import spark.implicits._
    // q232's fold, driven directly through GlobalRank on fixtures
    def gini(xs: Seq[Long]): Long = {
      val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
        .toDF("doc_id", "n_chars")
      val ranked = graft.operators.GlobalRank.withRank(
        df, Seq(col("n_chars"), col("doc_id")), rankCol = "rank")
      ranked.agg(count(lit(1)).as("n"),
          sum($"n_chars").as("total_chars"),
          graft.ext.Exact.decSum(
            graft.ext.Exact.dec($"rank") * $"n_chars").as("w"))
        .select(expr(s"((2 * w - (CAST(n AS ${graft.ext.Exact.Dec}) + 1)" +
          s" * total_chars) * 1000000) div" +
          s" (CAST(n AS ${graft.ext.Exact.Dec}) * total_chars)"))
        .head().getLong(0)
    }
    assert(gini(Seq.fill(10)(37L)) === 0L)
    // 9 docs of ~nothing, 1 doc of everything: gini -> 0.9
    val skewed = gini(Seq.fill(9)(0L) :+ 1000000L)
    assert(skewed === 900000L, s"got $skewed")
  }

  test("chao1 formula: hand value, f2 = 0 stays finite") {
    import spark.implicits._
    // source X: words a(1) b(1) c(2) d(3) -> S=4, f1=2, f2=1,
    // chao1 = 4 + 2*1/(2*2) = 4.5 -> 4500 milli
    val docs = Seq(
      (1L, "X", "a b c"), (2L, "X", "c d d d")
    ).toDF("doc_id", "source", "text")
    val got = graft.queries.Extended24.chao1Fold(docs).head()
    assert(got.getAs[Long]("s_obs") === 4L)
    assert(got.getAs[Long]("f1") === 2L)
    assert(got.getAs[Long]("f2") === 1L)
    assert(got.getAs[Long]("chao1_milli") === 4500L)
    // f2 = 0: a(1) b(1) -> 2 + 2*1/2 = 3.0
    val d2 = Seq((1L, "Y", "a b")).toDF("doc_id", "source", "text")
    assert(graft.queries.Extended24.chao1Fold(d2).head()
      .getAs[Long]("chao1_milli") === 3000L)
  }

  test("chunk accounting: window 64 / stride 48 boundary cases") {
    import spark.implicits._
    // nt = 64 -> 1 chunk of 64; nt = 65 -> 2 chunks (64 + 17);
    // nt = 5 -> 1 chunk of 5; nt = 160 -> starts 1,49,97 -> 64+64+64
    val mk = (n: Int) => (1 to n).map(_ => "t").mkString(" ")
    val docs = Seq((1L, "s64", mk(64)), (2L, "s65", mk(65)),
      (3L, "s5", mk(5)), (4L, "s160", mk(160)))
      .toDF("doc_id", "source", "text")
    val rows = graft.queries.Extended24.chunkFold(
      docs.select(col("source"),
        size(graft.functions.TextFns.tokens(col("text"))).as("nt"))
        .filter(col("nt") >= 1)).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("sum_chunk_tokens")))
      .toMap
    assert(rows("s64") === ((1L, 64L)))
    assert(rows("s65") === ((2L, 64L + 17L)))
    assert(rows("s5") === ((1L, 5L)))
    assert(rows("s160") === ((3L, 192L)))
  }

  test("burstiness: a token concentrated in one doc reads high VMR, " +
    "a uniform token reads sub-1") {
    import spark.implicits._
    // 10 docs; "u" once in every doc (VMR = (10*10-100)/(10*10) = 0);
    // "b" 10 times in one doc (S=10, Q=100, VMR=(1000-100)/100 = 9.0)
    val docs = (1 to 10).map { i =>
      val b = if (i == 1) " " + Seq.fill(10)("b").mkString(" ") else ""
      (i.toLong, "s", "u" + b)
    }.toDF("doc_id", "source", "text")
    val got = graft.queries.Extended24.burstinessFold(docs, minCount = 5).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("vmr_micro")).toMap
    assert(got("u") === 0L)
    assert(got("b") === 9000000L)
  }
}
