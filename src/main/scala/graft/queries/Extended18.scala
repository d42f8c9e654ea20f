package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Round-10 batch (q183–q186) — this round's library shelves, each
  * gated through its operator:
  *
  *  - q183 bigram-LM perplexity filtering (ext/LanguageModel): train on
  *    the 'en' slice, score the whole corpus — the CCNet cross-lingual
  *    quality filter (q130's unigram proxy grown a conditioning token);
  *  - q184 Bloom-filter membership sketch + pruned anti join
  *    (ext/BloomSketch) — the runtime-filter economics for 100 TB
  *    decontamination, gated on its no-false-negative contract;
  *  - q185 reciprocal-rank fusion (ext/Retrieval.rrfFuse) of BM25 and
  *    brute-cosine rankings — the hybrid-retrieval combiner;
  *  - q186 personalized PageRank (ext/Graph.personalizedPageRank) —
  *    seed-set proximity, the "expand this whitelist" primitive.
  */
object Extended18 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------------
  // q183 — bigram-LM quality scoring: train the interpolated bigram
  // model (λ = 9/10 on the bigram term, unigram backoff, OOV floor
  // 20 nats) on lang='en' documents, score EVERY document by average
  // per-transition NLL in floor-micro-nats, aggregate per language.
  // The semantic check rides the gate: 'en' must score lowest (the
  // model recognizes its own training distribution) and that ordering
  // is part of the hashed result.
  //
  // Scale: training counts collapse map-side on the bigram-type frame;
  // scoring shuffles on the bigram key (stopword-head skew = the q93 /
  // AQE-skew territory); every probability is a ratio of exact BIGINT
  // counts floored to micro-nats per TYPE, so per-doc sums are
  // aggregation-order-proof (the q130 doctrine).
  def q183(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
    val counts = graft.ext.LanguageModel
      .bigramCounts(d.filter($"lang" === "en"), "text", "doc_id")
    val model = graft.ext.LanguageModel.bigramModel(counts)
    graft.ext.LanguageModel.scoreBigrams(d, "text", "doc_id", model)
      .join(d.select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_trans").as("n_trans"),
        sum($"nll_sum_micro").as("nll_sum_micro"))
      .select($"lang", $"n_docs", $"n_trans", $"nll_sum_micro",
        expr("nll_sum_micro div n_trans").as("nll_avg_micro"))
      .orderBy($"lang")
  }

  val q183Sql: String =
    """WITH tk AS (SELECT doc_id, lang,
      |        regexp_split_to_array(trim(text), '\s+') AS toks
      |        FROM documents),
      | ix AS (SELECT doc_id, lang, toks,
      |        unnest(generate_series(1, len(toks) - 1)) AS i
      |        FROM tk WHERE len(toks) >= 2),
      | pairs AS (SELECT doc_id, lang, toks[i] AS u, toks[i + 1] AS v FROM ix),
      | occ AS (SELECT doc_id, u, v, CAST(count(*) AS BIGINT) AS occ
      |        FROM pairs GROUP BY 1, 2, 3),
      | train AS (SELECT u, v, CAST(count(*) AS BIGINT) AS c
      |        FROM pairs WHERE lang = 'en' GROUP BY 1, 2),
      | cu AS (SELECT u, CAST(sum(c) AS BIGINT) AS cu FROM train GROUP BY u),
      | cv AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM train GROUP BY v),
      | n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM train),
      | model AS (SELECT t.u, t.v,
      |        CAST(floor(-ln(0.9 * CAST(t.c AS DOUBLE) / CAST(cu.cu AS DOUBLE)
      |              + 0.1 * CAST(cv.cv AS DOUBLE)
      |                / CAST((SELECT n FROM n) AS DOUBLE)) * 1000000.0)
      |          AS BIGINT) AS nll_micro
      |        FROM train t JOIN cu ON cu.u = t.u JOIN cv ON cv.v = t.v),
      | backoff AS (SELECT v,
      |        CAST(floor(-ln(0.1 * CAST(cv AS DOUBLE)
      |              / CAST((SELECT n FROM n) AS DOUBLE)) * 1000000.0)
      |          AS BIGINT) AS bo_micro
      |        FROM cv),
      | scored AS (SELECT o.doc_id, o.occ,
      |        COALESCE(m.nll_micro, b.bo_micro, 20000000) AS nll
      |        FROM occ o
      |        LEFT JOIN model m ON m.u = o.u AND m.v = o.v
      |        LEFT JOIN backoff b ON b.v = o.v),
      | perdoc AS (SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_trans,
      |        CAST(sum(occ * nll) AS BIGINT) AS nll_sum
      |        FROM scored GROUP BY doc_id)
      |SELECT d.lang, count(*) AS n_docs,
      |       CAST(sum(p.n_trans) AS BIGINT) AS n_trans,
      |       CAST(sum(p.nll_sum) AS BIGINT) AS nll_sum_micro,
      |       CAST(sum(p.nll_sum) // sum(p.n_trans) AS BIGINT) AS nll_avg_micro
      |FROM perdoc p JOIN documents d ON d.doc_id = p.doc_id
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  // --------------------------------------------------------------------
  // q184 — Bloom-sketch pruned anti join: build the membership filter
  // over the "benchmark" key set (customers with c_custkey % 7 = 0,
  // m = 4096 bits, k = 5 hashes), then decontaminate orders against it
  // with BloomSketch.prunedAntiJoin. The gate pins the sketch's
  // CONTRACT, not its bit pattern (hashes aren't SQL-portable — the
  // q117/q147/q159 sketch-shelf technique):
  //   pruned ≡ exact  — the pruned anti join returns EXACTLY the plain
  //                     anti join (no false negatives ⇒ lossless);
  //   no_false_neg    — every member probes true;
  //   fp_within_bound — false positives over the non-member key domain
  //                     ≤ 5× the (1−e^(−kn/m))^k expectation + slack.
  def q184(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val B = graft.ext.BloomSketch
    val numBits = 4096
    val numHashes = 5
    val cust = t(s, dir, "customer")
    val dim = cust.filter($"c_custkey" % 7 === 0).select($"c_custkey".as("k"))
    val fact = t(s, dir, "orders")
    val bloom = broadcast(B.packed(B.addAll(dim, "k", numBits, numHashes), numBits))
    val exactN = fact
      .join(dim.select($"k".as("o_custkey")), Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_exact"))
    val prunedN = B.prunedAntiJoin(fact, "o_custkey", dim, "k", numBits, numHashes)
      .agg(count(lit(1)).as("n_pruned"))
    val nMem = dim.agg(count(lit(1)).as("n_members"))
    val falseNeg = dim.crossJoin(bloom)
      .filter(!B.mightContain($"k", $"bloom", numBits, numHashes))
      .agg(count(lit(1)).as("n_false_neg"))
    val fp = cust.filter($"c_custkey" % 7 =!= 0)
      .select($"c_custkey".as("k")).crossJoin(bloom)
      .withColumn("maybe", B.mightContain($"k", $"bloom", numBits, numHashes))
      .agg(count(lit(1)).as("n_nonmembers"),
        sum(when($"maybe", 1L).otherwise(0L)).as("n_fp"))
    nMem.crossJoin(exactN).crossJoin(prunedN).crossJoin(falseNeg).crossJoin(fp)
      .select($"n_members", $"n_exact",
        ($"n_pruned" === $"n_exact").as("pruned_matches_exact"),
        ($"n_false_neg" === 0L).as("no_false_negatives"),
        ($"n_fp".cast("double") <=
          greatest(
            ceil(lit(5.0) *
              pow(lit(1.0) - exp(lit(-numHashes.toDouble) *
                $"n_members".cast("double") / lit(numBits.toDouble)),
                lit(numHashes.toDouble)) *
              $"n_nonmembers".cast("double")).cast("double"),
            lit(10.0))).as("fp_within_bound"))
  }

  val q184Sql: String =
    """SELECT
      |  (SELECT count(*) FROM customer WHERE c_custkey % 7 = 0) AS n_members,
      |  (SELECT count(*) FROM orders o WHERE NOT EXISTS (
      |     SELECT 1 FROM customer c
      |     WHERE c.c_custkey % 7 = 0 AND c.c_custkey = o.o_custkey)) AS n_exact,
      |  TRUE AS pruned_matches_exact,
      |  TRUE AS no_false_negatives,
      |  TRUE AS fp_within_bound""".stripMargin

  // --------------------------------------------------------------------
  // q185 — hybrid retrieval via reciprocal rank fusion: the BM25 top-50
  // for ('data', 'model') from the built index (ext/Index, q181's
  // ranker) fused with the brute-cosine top-50 around probe vector 0
  // (q23's ranker, scores in round-half-up basis points so ranking is
  // integer-deterministic), RRF k₀ = 60 in exact nano units. Both
  // input lists are BOUNDED (top-50) before fusion — the corpus-sized
  // work stays inside the rankers, fusion touches ≤ 100 rows.
  def q185(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lex = graft.ext.Index.build(t(s, dir, "documents"), "text", "doc_id")
      .search(Seq("data", "model"), k = 50)
      .select($"doc_id".as("id"), $"score_nano".as("score"))
    val e = t(s, dir, "embeddings")
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val vec = e.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(q))
      .select($"vec_id".as("id"),
        floor(VectorFns.cosine($"embedding", $"qvec") * 10000.0 + 0.5)
          .cast("long").as("score"))
      .orderBy($"score".desc, $"id".asc)
      .limit(50)
    graft.ext.Retrieval
      .rrfFuse(Seq("lex" -> lex, "vec" -> vec), "id", "score", k0 = 60)
      .limit(10)
  }

  val q185Sql: String = {
    val dot =
      """list_sum(list_transform(list_zip(e.embedding, q.qvec),
        | x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))""".stripMargin
    val norm = (v: String) =>
      s"sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    s"""WITH d AS (SELECT doc_id,
       |        regexp_split_to_array(trim(text), '\\s+') AS toks
       |        FROM documents),
       | dd AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM d),
       | corpus AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dd),
       | tf AS (SELECT token, doc_id, dl, count(*) AS tf
       |        FROM (SELECT doc_id, dl, unnest(toks) AS token FROM dd)
       |        GROUP BY 1, 2, 3),
       | dict AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
       | scored AS (
       |   SELECT t.doc_id,
       |     floor(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
       |              / (CAST(df AS DOUBLE) + 0.5))
       |       * (CAST(t.tf AS DOUBLE) * 2.2
       |          / (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75
       |             * CAST(t.dl AS DOUBLE)
       |             / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
       |       * 1000000000.0) AS s_nano
       |   FROM tf t JOIN dict USING (token) CROSS JOIN corpus
       |   WHERE t.token IN ('data', 'model')),
       | lex AS (SELECT doc_id AS id, CAST(sum(s_nano) AS BIGINT) AS score
       |   FROM scored GROUP BY doc_id
       |   ORDER BY score DESC, id LIMIT 50),
       | q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
       | vec AS (SELECT e.vec_id AS id,
       |     CAST(floor($dot / (${norm("e.embedding")} * ${norm("q.qvec")})
       |       * 10000.0 + 0.5) AS BIGINT) AS score
       |   FROM embeddings e CROSS JOIN q
       |   WHERE e.vec_id <> 0
       |   ORDER BY score DESC, id LIMIT 50),
       | lexr AS (SELECT id, CAST(row_number() OVER (
       |        ORDER BY score DESC, id) AS BIGINT) AS rank FROM lex),
       | vecr AS (SELECT id, CAST(row_number() OVER (
       |        ORDER BY score DESC, id) AS BIGINT) AS rank FROM vec),
       | u AS (SELECT id, 'lex' AS list, rank FROM lexr
       |       UNION ALL SELECT id, 'vec', rank FROM vecr)
       |SELECT id,
       |  CAST(sum(1000000000 // (60 + rank)) AS BIGINT) AS rrf_nano,
       |  count(*) AS n_lists,
       |  CAST(max(CASE WHEN list = 'lex' THEN rank END) AS BIGINT) AS rank_lex,
       |  CAST(max(CASE WHEN list = 'vec' THEN rank END) AS BIGINT) AS rank_vec
       |FROM u GROUP BY id
       |ORDER BY rrf_nano DESC, id LIMIT 10""".stripMargin
  }

  // --------------------------------------------------------------------
  // q186 — personalized PageRank: q134's part↔supplier bipartite graph,
  // restart mass concentrated on the seed set {part nodes, p_partkey %
  // 97 = 0} (pulled from the PART dim so seeds without graph edges
  // exercise the full-outer universe path), 3 supersteps, integer ppt
  // (Graph.personalizedPageRank with checkConvergence=false — the
  // oracle is the 3-round unroll, q134's contract). Top 20 by
  // proximity; suppliers serving the seed parts dominate.
  def q186(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val half = t(s, dir, "lineitem")
      .select(($"l_partkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
    val edges = half.union(half.select($"dst".as("src"), $"src".as("dst")))
    val seeds = t(s, dir, "part")
      .filter($"p_partkey" % 97 === 0)
      .select(($"p_partkey" * 2).as("node"))
    graft.ext.Graph
      .personalizedPageRank(edges, seeds, maxIterations = 3,
        checkConvergence = false)
      .select($"node", ($"node" % 2).as("is_supp"), $"r".as("rank_ppt"))
      .orderBy($"rank_ppt".desc, $"node")
      .limit(20)
  }

  val q186Sql: String = {
    def step(prev: String, cur: String): String =
      s""" acc_$cur AS (
         |  SELECT e.dst AS node, CAST(sum(p.r // b.d) AS BIGINT) AS acc
         |  FROM e JOIN $prev p ON p.node = e.src
         |         JOIN base b ON b.node = e.src
         |  WHERE b.d > 0
         |  GROUP BY e.dst),
         | $cur AS (
         |  SELECT b.node,
         |    CAST(b.rst + (85 * coalesce(a.acc, 0)) // 100 AS BIGINT) AS r
         |  FROM base b LEFT JOIN acc_$cur a ON a.node = b.node)""".stripMargin
    s"""WITH half AS (
       |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM lineitem),
       | e AS (SELECT src, dst FROM half
       |       UNION ALL SELECT dst AS src, src AS dst FROM half),
       | deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),
       | seeds AS (SELECT DISTINCT p_partkey * 2 AS node FROM part
       |           WHERE p_partkey % 97 = 0),
       | ns AS (SELECT count(*) AS ns FROM seeds),
       | base AS (
       |  SELECT coalesce(d.node, s.node) AS node,
       |         coalesce(d.d, 0) AS d,
       |         CASE WHEN s.node IS NOT NULL
       |              THEN 150000000000 // (SELECT ns FROM ns) ELSE 0 END AS rst,
       |         CASE WHEN s.node IS NOT NULL
       |              THEN 1000000000000 // (SELECT ns FROM ns) ELSE 0 END AS r0
       |  FROM deg d FULL OUTER JOIN seeds s ON s.node = d.node),
       | r0 AS (SELECT node, CAST(r0 AS BIGINT) AS r FROM base),
       |${step("r0", "r1")},
       |${step("r1", "r2")},
       |${step("r2", "r3")}
       |SELECT node, node % 2 AS is_supp, r AS rank_ppt
       |FROM r3 ORDER BY rank_ppt DESC, node LIMIT 20""".stripMargin
  }

  /** Name → query function, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q183_bigram_lm" -> (q183 _),
    "q184_bloom_prune" -> (q184 _),
    "q185_rrf_hybrid" -> (q185 _),
    "q186_personalized_pagerank" -> (q186 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q183_bigram_lm" -> q183Sql,
    "q184_bloom_prune" -> q184Sql,
    "q185_rrf_hybrid" -> q185Sql,
    "q186_personalized_pagerank" -> q186Sql
  )
}
