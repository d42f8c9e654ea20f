package graft

import org.apache.spark.sql.functions._

import graft.ext.TextDedup
import graft.queries.Tables

/** The Ed-Join rarest-prefix rewrite (r13 verdict item: the all-grams
  * bigram blocker shuffled Σ df² candidates on a Zipf key): the join
  * input carries at most destroyBudget+1 rows per string, candidates
  * stay complete under an engineered super-hot gram, and the volume
  * advantage over all-grams blocking is structural, not incidental.
  */
class EdJoinPrefixSpec extends SparkSpec {

  private def levOk(a: String, b: String, k: Int): Boolean = {
    if (math.abs(a.length - b.length) > k) return false
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length) <= k
  }

  // Zipf-ish fixture: every string shares the super-hot "aa" prefix
  // (the gram a natural-language corpus would detonate on), with a
  // long tail of rare suffix grams; clusters of 3 are 1-2 edits apart.
  private def hotFixture = {
    import spark.implicits._
    (0 until 120).map { i =>
      val base = s"aaaa${('b' + i / 3).toChar}x${i / 3}zq"
      i % 3 match {
        case 0 => base
        case 1 => base.dropRight(1) + "w"          // 1 substitution
        case _ => base + "m"                       // 1 insertion
      }
    }.distinct.toDF("name")
  }

  test("join input invariant: <= destroyBudget+1 tagged grams per " +
    "string, on the fixture AND on q151's real input") {
    val fx = TextDedup.taggedGrams(hotFixture, "name", "name", 2)
    val dfx = fx.groupBy(col("g"), col("o")).agg(count(lit(1)).as("df"))
    val maxFx = TextDedup.gramPrefix(fx, dfx, 5)
      .groupBy(col("id")).count().agg(max(col("count"))).head().getLong(0)
    assert(maxFx <= 5L, s"fixture prefix carried $maxFx rows per string")

    val names = Tables.load(spark, "/root/testdata/sf0.001", "part")
      .select(col("p_name").as("name")).distinct()
    val tg = TextDedup.taggedGrams(names, "name", "name", 2)
    val dfreq = tg.groupBy(col("g"), col("o")).agg(count(lit(1)).as("df"))
    val maxReal = TextDedup.gramPrefix(tg, dfreq, 5)
      .groupBy(col("id")).count().agg(max(col("count"))).head().getLong(0)
    assert(maxReal <= 5L, s"q151 prefix carried $maxReal rows per string")
  }

  test("the df lookup is a BroadcastHashJoin by construction — the " +
    "hot-gram shuffle straggler is impossible, not threshold luck") {
    val names = Tables.load(spark, "/root/testdata/sf0.001", "part")
      .select(col("p_name").as("name")).distinct()
    val tg = TextDedup.taggedGrams(names, "name", "name", 2)
    val dfreq = tg.groupBy(col("g"), col("o")).agg(count(lit(1)).as("df"))
    // force the threshold to -1: the broadcast must come from the
    // operator's own hint, not from autoBroadcastThreshold luck
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val pfx = TextDedup.gramPrefix(tg, dfreq, 5)
      val plan = pfx.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"gramPrefix df join must broadcast structurally, got:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"df join fell back to a shuffle join:\n$plan")
    }
  }

  private def withSQLConf[T](kv: (String, String)*)(f: => T): T = {
    val conf = spark.conf
    val saved = kv.map { case (k, _) => k -> conf.getOption(k) }
    kv.foreach { case (k, v) => conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("complete under the hot gram: every brute-force lev<=2 pair " +
    "is a candidate; volume beats all-grams blocking") {
    import spark.implicits._
    val names = hotFixture
    val cand = TextDedup.edJoinCandidates(names, "name", "name",
        names, "name", "name", q = 2, destroyBudget = 4, selfPairs = true)
      .select(col("a_str"), col("b_str")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val all = names.as[String].collect()
    val truth = (for {
      a <- all; b <- all if a < b && levOk(a, b, 2)
    } yield (a, b)).toSet
    assert(truth.subsetOf(cand),
      s"missed ${truth.diff(cand).take(5)} of ${truth.size} true pairs")
    // all-grams blocking on this fixture: every string shares "aa"
    // occurrences, so its candidate set is ~all-pairs; the prefix form
    // must stay well under that
    val tg = TextDedup.taggedGrams(names, "name", "name", 2)
    val allGramPairs = tg.as("a")
      .join(tg.as("b"),
        col("a.g") === col("b.g") && col("a.o") === col("b.o") &&
          col("a.str") < col("b.str"))
      .select(col("a.str"), col("b.str")).distinct().count()
    assert(cand.size.toLong * 2 < allGramPairs,
      s"prefix ${cand.size} vs all-grams $allGramPairs — no volume win")
  }

  test("deletionVariants: hand values and the C(len, <=k) key bound") {
    import spark.implicits._
    val got1 = Seq("abc").toDF("s")
      .select(TextDedup.deletionVariants(col("s"), 1).as("v"))
      .head().getSeq[String](0).toSet
    assert(got1 === Set("abc", "bc", "ac", "ab"))
    val got2 = Seq("abc").toDF("s")
      .select(TextDedup.deletionVariants(col("s"), 2).as("v"))
      .head().getSeq[String](0).toSet
    assert(got2 === Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    // bound: a len-5 string carries <= 1 + 5 + C(5,2) = 16 keys at k=2
    val n5 = Seq("abcde").toDF("s")
      .select(size(TextDedup.deletionVariants(col("s"), 2)).as("n"))
      .head().getInt(0)
    assert(n5 <= 16, s"len-5 neighborhood carried $n5 keys")
  }

  test("short stratum: deletion-neighborhood join is COMPLETE for " +
    "lev<=2 (k=2) and DL<=1 (k=1) on a short-name-heavy fixture") {
    import spark.implicits._
    // every len 2..5 string over a 4-letter alphabet that a dense
    // short corpus would contain — the exact stratum the old
    // all-pairs/cross carve-outs paid O(n^2)/O(n*|alphabet|^4) on
    val alpha = "abcd"
    val all = (2 to 4).flatMap { len =>
      (0 until math.pow(4, len).toInt).map { i =>
        (0 until len).map(p => alpha((i >> (2 * p)) & 3)).mkString
      }
    }.distinct
    val names = all.toDF("name")
      .withColumn("v", explode(TextDedup.deletionVariants(col("name"), 2)))
    val cand = names.as("a")
      .join(names.as("b"), col("a.v") === col("b.v") &&
        col("a.name") < col("b.name"))
      .select(col("a.name"), col("b.name")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val truth = (for {
      a <- all; b <- all if a < b && levOk(a, b, 2)
    } yield (a, b)).toSet
    assert(truth.subsetOf(cand),
      s"missed ${truth.diff(cand).take(5)} of ${truth.size} lev<=2 pairs")

    // DL<=1 at k=1: adjacent transpositions must share a variant
    val probes = Seq(("ab", "ba"), ("ax", "ay"), ("ab", "axb"))
    probes.foreach { case (a, b) =>
      val va = Seq(a).toDF("s")
        .select(TextDedup.deletionVariants(col("s"), 1)).head()
        .getSeq[String](0).toSet
      val vb = Seq(b).toDF("s")
        .select(TextDedup.deletionVariants(col("s"), 1)).head()
        .getSeq[String](0).toSet
      assert(va.intersect(vb).nonEmpty, s"($a, $b) share no D<=1 variant")
    }
  }

  test("estimateGramOrder: saturated alphabet drives q up, diverse " +
    "corpus stays at 2, id-hash sampling is deterministic") {
    import spark.implicits._
    // binary alphabet, 12 chars: every gram order <= 3 saturates
    val binary = (0 until 400).map { i =>
      (0 until 12).map(p => if (((i * 2654435761L >>> p) & 1) == 0) 'a'
        else 'b').mkString
    }.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "name")
    assert(TextDedup.estimateGramOrder(binary, "id", "name", maxQ = 4) === 4)
    // 26-letter pseudo-random names, small corpus: bigrams suffice
    // (java.util.Random's LCG is spec-fixed, so the fixture is stable)
    val rnd = new java.util.Random(42)
    val diverse = (0 until 200).map { i =>
      (0 until 12).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "name")
    assert(TextDedup.estimateGramOrder(diverse, "id", "name", maxQ = 4,
      budgetPerString = 64) === 2)
    // a corpus big enough to exercise the 1% sampling path: the
    // id-hash sample makes the estimate a pure function of the data
    val big = spark.range(20000).selectExpr("id",
      "concat_ws('', transform(sequence(1, 12), " +
        "p -> char(97 + pmod(xxhash64(id * 131 + p), 26)))) AS name")
    val e1 = TextDedup.estimateGramOrder(big, "id", "name",
      budgetPerString = 512)
    val e2 = TextDedup.estimateGramOrder(big, "id", "name",
      budgetPerString = 512)
    assert(e1 === e2, s"estimator not deterministic: $e1 vs $e2")
    assert(e1 >= 3, s"20k names must saturate bigrams, got q=$e1")
  }

  test("selfPairs: two distinct rows with the SAME string (lev = 0, " +
    "the hottest dedup case) still pair, ordered by id") {
    import spark.implicits._
    val rows = Seq((1L, "acme corporation"), (2L, "acme corporation"),
      (3L, "acme corporatian")).toDF("id", "name")
    val cand = TextDedup.edJoinCandidates(rows, "id", "name",
        rows, "id", "name", q = 2, destroyBudget = 4, selfPairs = true)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)), s"identical-string pair missing: $cand")
    assert(!cand.contains((2L, 1L)) && !cand.contains((1L, 1L)))
    assert(cand.contains((3L, 1L)) || cand.contains((1L, 3L)))
  }

  test("two-sided DL<=1 (q211 shape): every adjacent transposition " +
    "resolves to its source name") {
    import spark.implicits._
    val names = (0 until 60).map(i => s"dim${('a' + i % 7).toChar}ension$i")
      .distinct.toDF("name")
    val probes = names.select(col("name").as("src"),
        concat(substring(col("name"), 1, 2),
          substring(col("name"), 4, 1), substring(col("name"), 3, 1),
          expr("substring(name, 5)")).as("probe"))
      .withColumn("pid", monotonically_increasing_id())
    val cand = TextDedup.edJoinCandidates(probes, "pid", "probe",
        names, "name", "name", q = 2, destroyBudget = 3)
      .select(col("a_str").as("probe"), col("b_str").as("name"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = probes.select(col("probe"), col("src")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(want.subsetOf(cand),
      s"missed ${want.diff(cand).take(5)} of ${want.size} transpositions")
  }
}
