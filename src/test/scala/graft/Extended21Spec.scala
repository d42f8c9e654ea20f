package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvSketch
import graft.plans.{AcAutomaton, StringMatchExpressions}

/** Round-13 batch: string-matching natives (Damerau–Levenshtein,
  * Aho–Corasick), the KMV sketch, and cluster-scoped semantic dedup.
  * q211–q215 are DuckDB-oracle-gated; these pin the operator contracts
  * the oracles can't see (algorithm parity on adversarial inputs,
  * merge algebra, brute-force equivalence).
  */
class Extended21Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- DL

  test("damerauLevenshtein: DuckDB golden parity (unrestricted variant)") {
    import spark.implicits._
    // Golden values computed with DuckDB v1.0.0 damerau_levenshtein —
    // the oracle engine's exact variant (Lowrance–Wagner: transposed
    // blocks may be edited further, so ca→abc is 2, not OSA's 3).
    val goldens = Seq(
      ("ca", "abc", 2L), ("abc", "ca", 2L), ("ab", "ba", 1L),
      ("kitten", "sitting", 3L), ("", "abc", 3L), ("abc", "", 3L),
      ("same", "same", 0L), ("a", "b", 1L), ("teh cat", "the cat", 1L),
      ("red widget", "red widgte", 1L), ("small ring", "smal lring", 1L),
      ("blue bolt", "bleu bolt", 1L), ("xy", "yx", 1L),
      ("banana", "ananab", 2L),
      ("bdaa ", "c", 5L), ("", "baaddaba", 8L), ("da ab a ", "aba bc", 5L),
      ("b a c ", "a ", 4L), ("ca ", " ", 2L), ("", "d d", 3L),
      ("d dcc", "bba", 5L), (" dcd", " aa ", 3L), ("bcbdda", " ", 6L),
      ("cc d ", "aacdaac", 6L), ("cdcadcb", "d", 6L), ("", "cbb", 3L),
      ("ddabdd", "cbd cdcd", 5L), ("bab", "bb", 1L), ("", " bccabd", 7L),
      ("c  cb  a", " ddddad", 7L), ("ababdb", "c", 6L), ("", "a", 1L),
      (" a", " aab ", 3L), ("bcc cd", "a", 6L))
    val got = goldens.toDF("a", "b", "want")
      .withColumn("got", StringMatchExpressions.damerauLevenshtein($"a", $"b"))
      .filter($"got" =!= $"want").collect()
    assert(got.isEmpty, s"DL mismatches vs DuckDB goldens: ${got.mkString(";")}")
  }

  test("damerauLevenshtein: symmetric, bounded by levenshtein, null-safe") {
    import spark.implicits._
    val names = graft.queries.Tables.load(spark, dir, "part")
      .select($"p_name".as("a")).distinct().limit(30)
    val pairs = names.crossJoin(names.select($"a".as("b")))
    val bad = pairs.select(
        StringMatchExpressions.damerauLevenshtein($"a", $"b").as("ab"),
        StringMatchExpressions.damerauLevenshtein($"b", $"a").as("ba"),
        levenshtein($"a", $"b").cast("long").as("lev"),
        ($"a" === $"b").as("eq"))
      .filter($"ab" =!= $"ba" || $"ab" > $"lev" ||
        ($"eq" && $"ab" =!= 0) || (!$"eq" && $"ab" === 0))
      .count()
    assert(bad === 0, "DL violated symmetry/upper-bound/identity")
    val n = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(StringMatchExpressions.damerauLevenshtein($"a", $"b"))
      .collect()(0)
    assert(n.isNullAt(0), "null input must yield null")
  }

  // ------------------------------------------------------- Aho–Corasick

  test("multiMatch ≡ per-pattern contains on the documents fixture") {
    import spark.implicits._
    val pats = graft.queries.Extended21.Blocklist
    val docs = graft.queries.Tables.load(spark, dir, "documents")
    val naive = array(pats.map(p =>
      when($"text".contains(p), lit(p)).otherwise(lit(null))): _*)
    val diff = docs.select(
        StringMatchExpressions.multiMatch($"text", pats).as("ac"),
        filter(naive, x => x.isNotNull).as("ref"))
      .filter(to_json($"ac") =!= to_json($"ref")).count()
    assert(diff === 0, "AC disagreed with contains() on fixture docs")
  }

  test("multiMatch: overlapping and nested patterns, early exit, ASCII guard") {
    import spark.implicits._
    // nested ("ab" inside "abc"), overlapping occurrences, suffix-via-
    // failure-link matches ("bc" found while walking "abc"), no match
    val pats = Seq("ab", "abc", "bc", "zz")
    val rows = Seq(
      ("xabcx", Seq("ab", "abc", "bc")),
      ("ababab", Seq("ab")),
      ("bc", Seq("bc")),
      ("zzz", Seq("zz")),    // overlapping occurrences count once
      ("", Seq.empty[String]),
      ("ABC", Seq.empty[String])) // case-sensitive
    val got = rows.toDF("text", "want")
      .select(StringMatchExpressions.multiMatch($"text", pats).as("got"),
        $"want")
      .filter(to_json($"got") =!= to_json($"want")).count()
    assert(got === 0)
    // all-patterns-found early exit returns the complete set
    val all = Seq("zz abc").toDF("text")
      .select(StringMatchExpressions.multiMatch($"text", pats).as("g"))
      .head().getSeq[String](0)
    assert(all === Seq("ab", "abc", "bc", "zz"))
    intercept[IllegalArgumentException] { new AcAutomaton(Array.empty) }
    intercept[IllegalArgumentException] { new AcAutomaton(Array("")) }
    intercept[IllegalArgumentException] { new AcAutomaton(Array("é")) }
  }

  test("multiMatch: ASCII patterns never match inside multi-byte text") {
    import spark.implicits._
    // UTF-8 continuation bytes reset the automaton to root; 'a b' as a
    // pattern must still match around non-ASCII chars, never across them
    val pats = Seq("ab", "b c")
    val got = Seq(("aéb c", Seq("b c")), ("ab", Seq("ab")))
      .toDF("text", "want")
      .select(StringMatchExpressions.multiMatch($"text", pats).as("got"),
        $"want")
      .filter(to_json($"got") =!= to_json($"want")).count()
    assert(got === 0)
  }

  // --------------------------------------------------------------- KMV

  test("KmvSketch: merge of arbitrary splits ≡ whole-set sketch; distinct absorbed") {
    val k = 8
    val agg = KmvSketch(k)
    val values = (1 to 100).map(i => f"h${(i * 37) % 61}%03d") // dups included
    val whole = values.foldLeft(agg.zero)(agg.reduce)
    assert(whole === values.distinct.sorted.take(k),
      "sketch must be the k smallest DISTINCT values")
    // any 3-way split, merged in any order, gives the same sketch
    val (s1, rest) = values.splitAt(13)
    val (s2, s3) = rest.splitAt(41)
    val parts = Seq(s1, s2, s3).map(_.foldLeft(agg.zero)(agg.reduce))
    assert(agg.merge(agg.merge(parts(0), parts(1)), parts(2)) === whole)
    assert(agg.merge(parts(2), agg.merge(parts(1), parts(0))) === whole)
    // saturated-buffer early reject keeps the invariant
    val sat = agg.reduce(whole, "zzz")
    assert(sat === whole)
  }

  test("q213 estimator: sketch Jaccard within tolerance of exact on fixture") {
    import spark.implicits._
    val out = graft.queries.Extended21.q213(spark, dir)
      .select($"source_a", $"source_b", $"jac_ppm").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val toks = graft.queries.Tables.load(spark, dir, "documents")
      .select($"source", split(trim($"text"), "\\s+").as("ts"))
      .select($"source", explode(when(size($"ts") >= 2,
        transform(sequence(lit(1), size($"ts") - 1),
          i => concat(element_at($"ts", i), lit(" "),
            element_at($"ts", i + 1))))
        .otherwise(array())).as("g"))
      .distinct().collect().map(r => r.getString(0) -> r.getString(1))
    val bySrc = toks.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).toSet }
    out.foreach { case ((a, b), est) =>
      val inter = bySrc(a).intersect(bySrc(b)).size.toDouble
      val exact = inter / bySrc(a).union(bySrc(b)).size
      // k = 32 sample of the union: generous 3-sigma-ish band
      assert(math.abs(est / 1e6 - exact) < 0.30,
        s"($a,$b): est ${est / 1e6} vs exact $exact")
    }
  }

  // --------------------------------------------------------------- HRW

  test("q216: every HRW-moved doc moves TO the new shard (minimal disruption)") {
    import spark.implicits._
    // the defining rendezvous property: growing k → k+1 only reassigns
    // docs the NEW shard wins — so under 8 → 9, moved ⟺ hrw9 = 8.
    // (Weights are per-(doc, shard) hashes, so existing shards' weights
    // are unchanged; argmax can only flip to the added shard.)
    def w(sh: Int) = conv(substring(md5(concat($"doc_id".cast("string"),
      lit(s":$sh"))), 1, 15), 16, 10).cast("long")
    def shard(k: Int) = array_max(array((0 until k).map(sh =>
      struct(w(sh).as("w"), lit(sh).as("s"))): _*)).getField("s")
    val d = graft.queries.Tables.load(spark, dir, "documents")
      .select($"doc_id", shard(8).as("h8"), shard(9).as("h9"))
    val violations = d.filter($"h8" =!= $"h9" && $"h9" =!= 8).count()
    assert(violations === 0, "a doc moved between PRE-EXISTING shards")
    val moved = d.filter($"h8" =!= $"h9").count()
    val toNew = d.filter($"h9" === 8).count()
    assert(moved === toNew, "moved set must equal the new shard's intake")
  }

  // -------------------------------------------------------- eval shelf

  test("cohenKappaPpm: exact 1e6 on perfect agreement, exact 0 on a constant predictor") {
    import spark.implicits._
    val labels = (0L until 60L).map(i => (i, (i % 3).toInt)).toDF("id", "label")
    val perfect = graft.ext.Eval.cohenKappaPpm(
      labels.withColumn("pred", $"label"), "label", "pred").head()
    assert(perfect.getAs[Long]("po_ppm") === 1000000L)
    assert(perfect.getAs[Long]("kappa_ppm") === 1000000L)
    // constant predictor: po == pe == majority share, kappa EXACTLY 0
    // (the ppm integer divisions cancel: (n_c·10⁶·n) div n² = (n_c·10⁶) div n)
    val const = graft.ext.Eval.cohenKappaPpm(
      labels.withColumn("pred", lit(0)), "label", "pred").head()
    assert(const.getAs[Long]("po_ppm") === const.getAs[Long]("pe_ppm"))
    assert(const.getAs[Long]("kappa_ppm") === 0L)
    // degenerate single-class corpus: pe = 10⁶ zeroes the denominator;
    // defined as 10⁶ by convention (the fleissKappaPpm guard) instead
    // of a silent NULL / ANSI divide-by-zero
    import spark.implicits._
    val single = (0L until 8L).map(i => (i, 3, 3)).toDF("id", "label", "pred")
    val deg = graft.ext.Eval.cohenKappaPpm(single, "label", "pred").head()
    assert(deg.getAs[Long]("pe_ppm") === 1000000L)
    assert(deg.getAs[Long]("kappa_ppm") === 1000000L)
  }

  test("centroidPredictions + confusion: marginals consistent, separable clusters perfect") {
    import spark.implicits._
    // two tight clusters labeled correctly → centroid classifier is exact
    val emb = (0L until 20L).map { i =>
      val lab = if (i < 10) 0 else 1
      val v = if (lab == 0) Seq(1.0f, 0.01f * i) else Seq(0.01f * i, 1.0f)
      (i, v, lab)
    }.toDF("vec_id", "embedding", "label")
    val p = graft.ext.Eval.centroidPredictions(emb, "embedding", "label")
    val conf = graft.ext.Eval.confusion(p, "label", "pred").collect()
    assert(conf.map(_.getLong(2)).sum === 20L)
    assert(conf.forall(r => r.getInt(0) === r.getInt(1)),
      s"separable clusters misclassified: ${conf.mkString(";")}")
    val kap = graft.ext.Eval.cohenKappaPpm(p, "label", "pred").head()
    assert(kap.getAs[Long]("kappa_ppm") === 1000000L)
    // the real fixture: labels are genuine signal (well above chance)
    val e = graft.queries.Tables.load(spark, dir, "embeddings")
    val kp = graft.ext.Eval.cohenKappaPpm(
      graft.ext.Eval.centroidPredictions(e, "embedding", "label"),
      "label", "pred").head()
    assert(kp.getAs[Long]("po_ppm") > kp.getAs[Long]("pe_ppm"),
      "fixture labels should beat marginal chance")
    assert(kp.getAs[Long]("kappa_ppm") > 100000L,
      s"fixture kappa unexpectedly weak: $kp")
  }

  // ------------------------------------------- clustered semantic dedup

  test("semanticDedupClustered ≡ brute-force greedy rule on fixture") {
    import spark.implicits._
    val e = graft.queries.Tables.load(spark, dir, "embeddings")
    val centroids = graft.ext.VectorIndex
      .trainCentroids(e, "embedding", k = 8, iterations = 2)
    val flagged = graft.ext.VectorIndex
      .semanticDedupClustered(e, "embedding", "vec_id", centroids,
        tauBp = 4200)
    // brute force: assignment + all within-cell pairs above threshold
    val assigned = graft.ext.VectorIndex
      .assignCells(e, "embedding", centroids)
      .select($"vec_id", $"cell", $"embedding")
    val cells = assigned.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cosBp(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000 + 0.5).toLong
    }
    val expectDrop = (for {
      (ia, ca, va) <- cells
      (ib, cb, vb) <- cells
      if ca == cb && ia < ib && cosBp(va, vb) >= 4200
    } yield ib).toSet
    val gotDrop = flagged.filter(!$"keep").select($"vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(gotDrop === expectDrop,
      s"dropped sets differ: extra=${gotDrop -- expectDrop} " +
        s"missing=${expectDrop -- gotDrop}")
    // row cardinality: one verdict per input vector
    assert(flagged.count() === e.count())
  }
}
