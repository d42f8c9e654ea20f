package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.plans.TextExpressions

/** Native text expressions vs the HOF reference pipelines — must be
  * bit-identical (the DuckDB oracles encode the HOF derivation). */
class TextExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.queries.Tables
    .load(spark, "/root/testdata/sf0.001", "documents")
    .withColumn("toks", TextFns.tokens($"text"))

  test("TokenSimHash == HOF simhashFromDigests, 16 and 32 bits") {
    Seq(16, 32).foreach { bits =>
      val diff = docs
        .withColumn("dg", TextFns.tokenDigests($"toks"))
        .select(
          TextExpressions.simhash($"toks", bits).as("native"),
          TextFns.simhashFromDigests($"dg", bits).as("hof"))
        .filter($"native" =!= $"hof")
        .count()
      assert(diff === 0, s"simhash mismatch at $bits bits")
    }
  }

  test("TokenSimHash rejects bits > 32 (md5 has 32 hex nibbles)") {
    // bits in 33-64 would index past the 16-byte digest at runtime
    intercept[IllegalArgumentException] {
      graft.plans.TokenSimHash(
        org.apache.spark.sql.graft.Bridge.expression($"toks"), 33)
    }
    intercept[IllegalArgumentException] {
      graft.plans.TokenSimHash(
        org.apache.spark.sql.graft.Bridge.expression($"toks"), 0)
    }
  }

  test("MinHashSig == HOF ngrams->digests->minhash pipeline") {
    Seq((3, 4), (2, 2), (5, 1)).foreach { case (ngram, nh) =>
      val hof = docs
        .withColumn("sh", TextFns.ngramsFromTokens($"toks", ngram))
        .withColumn("dg", TextFns.shingleDigests($"sh"))
        .select((0 until nh).map(i =>
          TextFns.minhashFromDigests($"dg", i).as(s"h$i")): _*)
      val native = docs
        .withColumn("sig", TextExpressions.minhashSig($"toks", ngram, nh))
        .select((0 until nh).map(i =>
          element_at($"sig", i + 1).as(s"h$i")): _*)
      assert(native.except(hof).count() === 0 &&
        hof.except(native).count() === 0,
        s"minhash mismatch at ngram=$ngram numHashes=$nh")
    }
  }

  test("edge cases: empty text, single token, short-than-ngram text") {
    val edge = Seq("", "one", "two words").toDF("text")
      .withColumn("toks", TextFns.tokens($"text"))
    val hof = edge
      .withColumn("sh", TextFns.ngramsFromTokens($"toks", 3))
      .withColumn("dg", TextFns.shingleDigests($"sh"))
      .select($"text", TextFns.minhashFromDigests($"dg", 0).as("h"),
        TextFns.simhashFromDigests(TextFns.tokenDigests($"toks"), 16).as("s"))
    val native = edge.select($"text",
      element_at(TextExpressions.minhashSig($"toks", 3, 1), 1).as("h"),
      TextExpressions.simhash($"toks", 16).as("s"))
    assert(native.except(hof).count() === 0)
  }

  test("StringArrayJaccard == HOF array_intersect formulation") {
    val pairs = docs
      .withColumn("sh", array_distinct(TextFns.ngramsFromTokens($"toks", 3)))
      .select($"doc_id", $"sh")
    val a = pairs.as("a")
    val b = pairs.as("b")
    val joined = a.join(b, col("b.doc_id") === col("a.doc_id") + 1)
    val isz = size(array_intersect(col("a.sh"), col("b.sh"))).cast("double")
    val diff = joined.select(
        TextExpressions.jaccard(col("a.sh"), col("b.sh")).as("native"),
        (isz / (size(col("a.sh")) + size(col("b.sh")) - isz)).as("hof"))
      .filter($"native" =!= $"hof")
      .count()
    assert(diff === 0)
    // edge semantics: empty union -> NULL, disjoint -> 0.0, equal -> 1.0
    val edges = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a"), Seq("b")),
      (Seq("a", "b"), Seq("b", "a"))
    ).toDF("x", "y")
      .select(TextExpressions.jaccard($"x", $"y").as("j"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(edges.toSeq === Seq(None, Some(0.0), Some(1.0)))
  }

  test("StringArrayIntersect == size(array_intersect), incl. dup/null elements") {
    import spark.implicits._
    val pairs = docs
      .withColumn("sh", array_distinct(TextFns.ngramsFromTokens($"toks", 3)))
      .select($"doc_id", $"sh")
    val joined = pairs.as("a")
      .join(pairs.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
    val diff = joined.select(
        TextExpressions.intersectCount(col("a.sh"), col("b.sh")).as("native"),
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("long").as("hof"))
      .filter($"native" =!= $"hof")
      .count()
    assert(diff === 0)
    // set semantics on non-distinct inputs + null-element skipping
    val edges = Seq(
      (Seq("a", "a", "b"), Seq("b", "b", "a")),   // dups count once -> 2
      (Seq("a", null), Seq(null, "a")),           // nulls ignored -> 1
      (Seq.empty[String], Seq("a"))               // empty -> 0
    ).toDF("x", "y")
      .select(TextExpressions.intersectCount($"x", $"y").as("c"))
      .collect().map(_.getLong(0))
    assert(edges.toSeq === Seq(2L, 1L, 0L))
  }

  test("NGramExplode generator == posexplode(ngramsFromTokens) on all edges") {
    import graft.plans.NGramExplode
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("x")),            // shorter than n => ONE short shingle
      (3L, Seq.empty[String]),   // empty array   => one empty shingle
      (4L, null)                 // null          => no rows
    ).toDF("id", "toks")
    Seq(2, 3).foreach { n =>
      val native = docs.select($"id", NGramExplode.of($"toks", n))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
      val hof = docs.select($"id",
          posexplode(graft.functions.TextFns.ngramsFromTokens($"toks", n)))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
      // identical on every non-null array; on a NULL array the HOF
      // pipeline leaks one (0, null) row (greatest(null,1) artifact),
      // the generator emits NOTHING (explode semantics) — documented
      // divergence, pinned here
      assert(native === hof.filter(_._1 != 4L), s"n=$n")
      assert(!native.exists(_._1 == 4L))
      assert(hof.filter(_._1 == 4L) === Seq((4L, 0, null)))
    }
    // plans a Generate node (UDTF execution path)
    val plan = docs.select($"id", NGramExplode.of($"toks", 2))
      .queryExecution.executedPlan
    assert(plan.collectFirst {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }.nonEmpty, plan.toString)
  }

  test("NGramRangeExplode == per-width full grams in one pass") {
    import graft.plans.{NGramExplode, NGramRangeExplode}
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("x", "y")),       // full grams at n=1,2 only
      (3L, Seq("x")),            // n=1 only — NO truncated 2/3-grams
      (4L, Seq.empty[String]),   // nothing at any n
      (5L, null)                 // null => no rows
    ).toDF("id", "toks")
    val got = docs.select($"id", NGramRangeExplode.of($"toks", 1, 3))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq.sorted
    // reference: per-width NGramExplode restricted to full grams
    // (size >= n filter recovers the full-gram subset)
    val want = (1 to 3).flatMap { n =>
      docs.filter(size($"toks") >= n)
        .select($"id", NGramExplode.of($"toks", n))
        .collect()
        .map(r => (r.getLong(0), n, r.getInt(1), r.getString(2)))
    }.sorted
    assert(got === want)
    assert(!got.exists(x => x._1 >= 3L && x._2 >= 2),
      "short docs must not emit truncated wide grams")
    val plan = docs.select($"id", NGramRangeExplode.of($"toks", 1, 3))
      .queryExecution.executedPlan
    assert(plan.collectFirst {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }.nonEmpty, plan.toString)
  }

  test("ngram_explode SQL function is registered") {
    val s2 = GraftSession.build(master = "local[4]", shufflePartitions = 4)
    val rows = s2.sql(
      "SELECT ngram_explode(array('a','b','c'), 2)")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows === Seq((0, "a b"), (1, "b c")))
    val range = s2.sql(
      "SELECT ngram_range_explode(array('a','b','c'), 1, 3)")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
    assert(range === Seq((1, 0, "a"), (1, 1, "b"), (1, 2, "c"),
      (2, 0, "a b"), (2, 1, "b c"), (3, 0, "a b c")))
  }

  test("simhash_tokens SQL function is registered") {
    val s2 = GraftSession.build(master = "local[4]", shufflePartitions = 4)
    val r = s2.sql(
      "SELECT simhash_tokens(array('a', 'b'), 8)").head().getLong(0)
    val viaApi = Seq(Seq("a", "b")).toDF("t")
      .select(TextExpressions.simhash($"t", 8)).head().getLong(0)
    assert(r === viaApi)
  }

  test("PiiScan == piiCount×3 + redactPii chain, incl. cross-pattern overlaps") {
    // last two rows force the order-sensitive cases: an IPv4-shaped span
    // inside an email localpart (counted by BOTH patterns, redacted as
    // one email), a phone run adjacent to an email.
    val texts = Seq(
      "plain text, no pii at all",
      "mail a.b@x.org and 10.0.0.1 and +48 123 456 789 done",
      "u10.0.0.1@ex.com hides a quad",
      "call 555 0123 4a@b.com now",
      "").toDF("t")
    val Seq(email, ip, phone) = TextFns.PiiPatterns.map(_._1)
    val diff = texts.select(
        TextExpressions.piiScan($"t").as("pii"),
        TextFns.piiCount($"t", email).as("e"),
        TextFns.piiCount($"t", ip).as("i"),
        TextFns.piiCount($"t", phone).as("p"),
        TextFns.redactPii($"t").as("red"))
      .filter($"pii.n_emails" =!= $"e" || $"pii.n_ips" =!= $"i" ||
        $"pii.n_phones" =!= $"p" || $"pii.redacted" =!= $"red")
      .count()
    assert(diff === 0)
    // and it stays inside whole-stage codegen (a LocalTableScan of a Seq
    // is pre-evaluated, so assert on a parquet-backed plan)
    val plan = graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(TextExpressions.piiScan($"text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"pii_scan fell out of codegen:\n$plan")
  }
}
