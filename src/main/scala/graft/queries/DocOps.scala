package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFns, VectorFns}

/** Training-data-pipeline operators over the `documents` and `embeddings`
  * tables: deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard),
  * similarity search (brute-force + LSH-bucketed ANN), and text analysis
  * (language ID, quality scoring, token counting, fingerprinting).
  *
  * These are the operators a 100 TB corpus pipeline needs; each is a
  * single declarative plan (no driver-side loops, no UDFs) so Catalyst
  * parallelizes them across any number of executors. The expensive ones
  * (LSH band join) are bucketed so the join key is the band hash — the
  * shuffle is proportional to candidate pairs, not |docs|².
  */
object DocOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Shared SQL fragments for the DuckDB oracles (shared with Extended5). */
  private[queries] val tokensSql = """regexp_split_to_array(trim(text), '\s+')"""
  private[queries] def ngramsSql(n: Int): String =
    s"""list_transform(
       | generate_series(1, greatest(len($tokensSql) - ${n - 1}, 1)),
       | i -> array_to_string(list_slice($tokensSql, i, i + ${n - 1}), ' '))""".stripMargin
  private[queries] def minhashChunkSql(ngrams: String, chunk: Int): String =
    s"list_min(list_transform($ngrams, s -> substr(md5(s), ${chunk * 8 + 1}, 8)))"

  // --------------------------------------------------------------------
  // q18 — exact dedup by content hash: the canonical first pass of any
  // corpus pipeline. groupBy(md5) is a single hash-partitioned shuffle;
  // at 100 TB the fingerprint is computed scan-side so only (hash, id)
  // pairs move.
  def q18(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.ext.TextDedup.exactGroups(t(s, dir, "documents"), "text", "doc_id")
      .orderBy($"fingerprint")
  }

  val q18Sql: String =
    """SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id,
      | count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin

  // --------------------------------------------------------------------
  // q19 — MinHash signatures over word 3-gram shingles (4 hash fns).
  // Per-row scalar work only: shingle → md5 → min, fully codegen'd,
  // no shuffle except the output sort.
  def q19(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .withColumn("toks", TextFns.tokens($"text"))
      .withColumn("sig", graft.plans.TextExpressions.minhashSig($"toks", 3, 4))
      .select(
        $"doc_id",
        element_at($"sig", 1).as("mh0"),
        element_at($"sig", 2).as("mh1"),
        element_at($"sig", 3).as("mh2"),
        element_at($"sig", 4).as("mh3")
      )
      .orderBy($"doc_id")
  }

  val q19Sql: String = {
    val ng = ngramsSql(3)
    s"""SELECT doc_id,
       | ${minhashChunkSql(ng, 0)} AS mh0,
       | ${minhashChunkSql(ng, 1)} AS mh1,
       | ${minhashChunkSql(ng, 2)} AS mh2,
       | ${minhashChunkSql(ng, 3)} AS mh3
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------------
  // q20 — MinHash-LSH near-duplicate candidate pairs: band = the full
  // 4-hash signature (bands of r=4 rows in LSH terms), bucket on the band
  // key, emit doc_id pairs (a < b). Instead of a self-join (which would
  // compute every signature twice and shuffle full signatures on both
  // sides), group by band and expand in-bucket pairs with array lambdas:
  // signatures are computed ONCE, there is ONE shuffle (on the band key),
  // and shuffle volume is (band, id) — the web-scale fuzzy-dedup layout.
  def q20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.ext.TextDedup
      .lshCandidates(t(s, dir, "documents"), "text", "doc_id",
        ngram = 3, numHashes = 4, bands = 1)
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"))
      .orderBy($"doc_a", $"doc_b")
  }

  val q20Sql: String = {
    val ng = ngramsSql(3)
    s"""WITH sig AS (
       | SELECT doc_id,
       |  ${minhashChunkSql(ng, 0)} || '|' || ${minhashChunkSql(ng, 1)} || '|' ||
       |  ${minhashChunkSql(ng, 2)} || '|' || ${minhashChunkSql(ng, 3)} AS band
       | FROM documents)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM sig a JOIN sig b ON a.band = b.band AND a.doc_id < b.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // --------------------------------------------------------------------
  // q21 — exact n-gram Jaccard similarity for adjacent doc pairs
  // (verification stage after LSH candidates): per-row array
  // intersection, no explode-per-shingle, no quadratic blow-up. union
  // size uses |A| + |B| - |A∩B| over distinct shingle sets.
  //
  // Shape: a self-join would run the tokenize→shingle→distinct pipeline
  // on BOTH branches (Catalyst duplicates the subtree) and shuffle twice.
  // Instead each doc's signature is computed ONCE and expanded to its two
  // pair roles — pair key d as the left element, pair key d-1 as the
  // right — then ONE groupBy(pair) reunites adjacent docs. Same
  // grouped-expansion layout as the LSH bucket path (TextDedup
  // .lshCandidates); still fully distributed (no global-order window).
  def q21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .withColumn("toks", TextFns.tokens($"text"))
      .select($"doc_id",
        graft.plans.TextExpressions.distinctNgrams($"toks", 3).as("sh"))
    d.select(explode(array(
        struct($"doc_id".as("pair"), lit(0).as("side"), $"sh"),
        struct(($"doc_id" - 1).as("pair"), lit(1).as("side"), $"sh")
      )).as("e"))
      .select($"e.pair".as("pair"), $"e.side".as("side"), $"e.sh".as("sh"))
      .groupBy($"pair")
      .agg(
        max(when($"side" === 0, $"sh")).as("sh_a"),
        max(when($"side" === 1, $"sh")).as("sh_b"))
      .filter($"sh_a".isNotNull && $"sh_b".isNotNull)
      .select(
        $"pair".as("doc_a"),
        ($"pair" + 1).as("doc_b"),
        // native one-pass distinct-set jaccard (array_intersect evaluates
        // interpreted with a full intermediate array per pair)
        round(graft.plans.TextExpressions.jaccard($"sh_a", $"sh_b"), 4)
          .as("jaccard")
      )
      .orderBy($"doc_a")
  }

  val q21Sql: String = {
    val sh = s"list_distinct(${ngramsSql(3)})"
    s"""WITH d AS (SELECT doc_id, $sh AS sh FROM documents)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       | round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |   (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4)
       |   AS jaccard
       |FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
       |ORDER BY doc_a""".stripMargin
  }

  // --------------------------------------------------------------------
  // q22 — SimHash (16-bit) near-dup fingerprints: one pass, per-row
  // higher-order aggregation over tokens; identical bit derivation in
  // any engine (md5 hex-char parity).
  def q22(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .withColumn("toks", TextFns.tokens($"text"))
      .select($"doc_id",
        graft.plans.TextExpressions.simhash($"toks", 16).as("simhash16"))
      .orderBy($"doc_id")
  }

  val q22Sql: String = {
    val bits = (0 until 16).map { b =>
      s"""(CASE WHEN CAST(list_sum(list_transform($tokensSql,
         |   t -> CASE WHEN ascii(substr(md5(t), ${b + 1}, 1)) % 2 = 1
         |        THEN 1 ELSE -1 END)) AS BIGINT) > 0
         | THEN ${1L << b} ELSE 0 END)""".stripMargin
    }.mkString(" + ")
    s"""SELECT doc_id, CAST($bits AS BIGINT) AS simhash16
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------------
  // q23 — brute-force cosine top-k (the ANN baseline): the query vector
  // is broadcast, similarity is a codegen'd map over the table, and
  // top-k compiles to TakeOrderedAndProject (per-partition heap + final
  // merge — no global sort even at 10^9 vectors).
  def q23(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    e.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(q))
      .select(
        $"vec_id",
        round(VectorFns.cosine($"embedding", $"qvec"), 4).as("cos_sim")
      )
      .orderBy($"cos_sim".desc, $"vec_id".asc)
      .limit(10)
  }

  private val dotSql =
    """list_sum(list_transform(list_zip(e.embedding, q.qvec),
      | x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))""".stripMargin
  private val normSql = (v: String) =>
    s"sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  val q23Sql: String =
    s"""WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
       |SELECT e.vec_id,
       | round($dotSql / (${normSql("e.embedding")} * ${normSql("q.qvec")}), 4)
       |   AS cos_sim
       |FROM embeddings e CROSS JOIN q
       |WHERE e.vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin

  // --------------------------------------------------------------------
  // q24 — embedding table statistics (norm distribution per label):
  // sanity pass any embedding pipeline runs before indexing.
  def q24(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "embeddings")
      .groupBy($"label")
      .agg(
        count(lit(1)).as("n"),
        round(avg(VectorFns.l2Norm($"embedding")), 3).as("avg_norm")
      )
      .orderBy($"label")
  }

  val q24Sql: String =
    s"""SELECT label, count(*) AS n,
       | round(avg(${normSql("embedding")}), 3) AS avg_norm
       |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  // --------------------------------------------------------------------
  // q25 — LSH-bucketed ANN (the scale path): vectors are bucketed by an
  // 8-bit sign signature (axis-aligned hyperplane LSH); search touches
  // only the query's bucket — at 10^9 vectors the candidate set is
  // ~|bucket| ≈ N/256 and the bucket id is a parquet partition key in a
  // real deployment, so the scan prunes to one partition.
  def q25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
      .withColumn("bucket", VectorFns.signBucket($"embedding", 8))
    val q = e.filter($"vec_id" === 0)
      .select($"bucket".as("qbucket"), $"embedding".as("qvec"))
    e.join(broadcast(q), $"bucket" === $"qbucket")
      .filter($"vec_id" =!= 0)
      .select(
        $"vec_id",
        round(VectorFns.cosine($"embedding", $"qvec"), 4).as("cos_sim")
      )
      .orderBy($"cos_sim".desc, $"vec_id".asc)
      .limit(5)
  }

  private val bucketSql = (v: String) =>
    (0 until 8).map(i => s"(CASE WHEN $v[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END)")
      .mkString("(", " + ", ")")

  val q25Sql: String =
    s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
       |           FROM embeddings),
       | q AS (SELECT bucket AS qbucket, embedding AS qvec FROM b WHERE vec_id = 0)
       |SELECT e.vec_id,
       | round($dotSql / (${normSql("e.embedding")} * ${normSql("q.qvec")}), 4)
       |   AS cos_sim
       |FROM b e JOIN q ON e.bucket = q.qbucket
       |WHERE e.vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id ASC LIMIT 5""".stripMargin

  // --------------------------------------------------------------------
  // q26 — heuristic language ID (stopword n-gram scoring) + rollup
  // against the labeled lang column.
  def q26(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .withColumn("toks", TextFns.tokens($"text"))
      .select($"doc_id", $"lang",
        TextFns.langIdFromTokens($"toks").as("detected"))
      .orderBy($"doc_id")
  }

  val q26Sql: String = {
    val hits = TextFns.LangStopwords.map { case (l, words) =>
      val set = words.map(w => s"'$w'").mkString(", ")
      l -> s"len(list_filter($tokensSql, x -> x IN ($set)))"
    }
    val best = hits.map(_._2).mkString("greatest(", ", ", ")")
    val pick = hits
      .map { case (l, h) => s"WHEN $h = best THEN '$l'" }
      .mkString(" ")
    s"""SELECT doc_id, lang,
       | CASE WHEN best = 0 THEN 'und' $pick ELSE 'und' END AS detected
       |FROM (SELECT doc_id, lang, text, $best AS best FROM documents) x
       |ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------------
  // q27 — text quality scoring: length / punctuation / stopword /
  // token-shape features, the cheap pre-filter for training corpora.
  def q27(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val en = TextFns.LangStopwords.toMap.apply("en")
    t(s, dir, "documents")
      .withColumn("toks", TextFns.tokens($"text")) // tokenize ONCE
      .select(
        $"doc_id",
        size($"toks").as("n_tokens"),
        round(TextFns.punctRatio($"text"), 4).as("punct_ratio"),
        round(TextFns.stopwordRatioFromTokens($"toks", en), 4)
          .as("stopword_ratio"),
        // floor(x*100+0.5)/100 instead of round(): both engines evaluate
        // it on the identical IEEE double, so knife-edge values (4.7249999…)
        // can't diverge between Spark's string-based round and DuckDB's.
        (floor(TextFns.meanTokenLengthFromTokens($"toks") * 100 + lit(0.5))
          / 100).as("mean_tok_len"),
        round(TextFns.qualityScoreFromTokens($"text", $"toks", en), 4)
          .as("quality")
      )
      .orderBy($"doc_id")
  }

  val q27Sql: String = {
    val en = TextFns.LangStopwords.toMap.apply("en").map(w => s"'$w'").mkString(", ")
    val nTok = s"len($tokensSql)"
    val punct =
      s"""(CASE WHEN length(text) > 0 THEN
         | CAST(length(text) - length(regexp_replace(text,
         |   '[.,!?;:''"()-]', '', 'g')) AS DOUBLE) / length(text)
         | ELSE 0.0 END)""".stripMargin
    val stop =
      s"""(CASE WHEN $nTok > 0 THEN
         | CAST(len(list_filter($tokensSql, x -> x IN ($en))) AS DOUBLE) / $nTok
         | ELSE 0.0 END)""".stripMargin
    val meanTok =
      s"""(CASE WHEN $nTok > 0 THEN
         | CAST(CAST(list_sum(list_transform($tokensSql, x -> length(x)))
         |   AS BIGINT) AS DOUBLE) / $nTok
         | ELSE 0.0 END)""".stripMargin
    val quality =
      s"""((least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
         | + (1.0 - least($punct * 5, 1.0))
         | + least($stop * 4, 1.0)) / 3)""".stripMargin
    s"""SELECT doc_id,
       | CAST($nTok AS INTEGER) AS n_tokens,
       | round($punct, 4) AS punct_ratio,
       | round($stop, 4) AS stopword_ratio,
       | floor(($meanTok) * 100 + 0.5) / 100 AS mean_tok_len,
       | round($quality, 4) AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------------
  // q28 — document fingerprinting + token-count estimation: stable
  // content ids (md5) and a BPE-ish size estimate for budget planning.
  def q28(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(
        $"doc_id",
        TextFns.fingerprint($"text").as("fp"),
        TextFns.approxBpeTokenCount($"text").as("approx_bpe_tokens"),
        length($"text").cast("long").as("n_chars_actual")
      )
      .orderBy($"doc_id")
  }

  val q28Sql: String =
    """SELECT doc_id, md5(text) AS fp,
      | CAST(ceil(length(regexp_replace(text, '\s+', '', 'g')) / 4.0)
      |   AS BIGINT) AS approx_bpe_tokens,
      | CAST(length(text) AS BIGINT) AS n_chars_actual
      |FROM documents ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q29 — multimodal column plumbing: opaque binary payloads + typed
  // metadata. The decode/feature-extract stage is stubbed (no media libs
  // in this container — see graft.ext.Multimodal); the Spark-side
  // contract (binary column, byte length, deterministic batch shape) is
  // real and oracle-checked here.
  def q29(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(
        $"doc_id",
        expr("octet_length(text)").cast("long").as("payload_bytes"),
        ascii(substring($"text", 1, 1)).as("magic_byte")
      )
      .orderBy($"doc_id")
  }

  val q29Sql: String =
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS payload_bytes,
      | CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS magic_byte
      |FROM documents ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q31 — multimodal decode stage: binary payload column → typed metadata
  // via the partition-parallel mapPartitions operator (graft.ext
  // .Multimodal). The decoder is the documented deterministic stub (no
  // media libs in this container); the distributed plumbing — binary
  // encoding, per-partition decoder init, batched iteration, typed
  // output schema — is real and oracle-checked here.
  def q31(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = graft.ext.Multimodal.mediaFromDocuments(s, t(s, dir, "documents"))
    graft.ext.Multimodal.imageMeta(media).toDF().orderBy($"media_id")
  }

  val q31Sql: String =
    """SELECT doc_id AS media_id,
      | CAST(64 + strlen(text) % 1856 AS INTEGER) AS width,
      | CAST(64 + (strlen(text) * 31 +
      |   CASE WHEN strlen(text) = 0 THEN 0 ELSE ascii(text) END) % 1016
      |   AS INTEGER) AS height,
      | CAST(1 + (CASE WHEN strlen(text) = 0 THEN 0 ELSE ascii(text) END) % 30
      |   AS INTEGER) AS n_frames,
      | CASE strlen(text) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
      |   ELSE 'webp' END AS format
      |FROM documents ORDER BY media_id""".stripMargin

  // --------------------------------------------------------------------
  // q32 — embedding-cosine near-duplicate pairs: LSH sign-bucket the
  // vectors (4 hyperplanes ⇒ 16 buckets), self-join within buckets only,
  // keep pairs above the similarity threshold. Scale: the shuffle key is
  // the bucket id, candidate pairs ≈ N²/buckets instead of N²; cosine is
  // the native codegen'd FloatVectorDot. floor(x*1e4+0.5)/1e4 rounding is
  // IEEE-stable across engines (see q27 note).
  def q32(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = t(s, dir, "embeddings")
      .withColumn("bucket", VectorFns.signBucket($"embedding", 4))
    val a = b.select($"bucket", $"vec_id".as("vec_a"), $"embedding".as("ea"))
    val c = b.select($"bucket", $"vec_id".as("vec_b"), $"embedding".as("eb"))
    a.join(c, Seq("bucket"))
      .filter($"vec_a" < $"vec_b")
      .select($"vec_a", $"vec_b",
        (floor(VectorFns.cosine($"ea", $"eb") * 10000 + lit(0.5)) / 10000)
          .as("cos_sim"))
      .filter($"cos_sim" > 0.4)
      .orderBy($"vec_a", $"vec_b")
  }

  val q32Sql: String = {
    val cos =
      s"""(list_sum(list_transform(list_zip(a.embedding, b2.embedding),
         |   x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
         | (${normSql("a.embedding")} * ${normSql("b2.embedding")}))""".stripMargin
    s"""WITH b AS (SELECT vec_id, embedding,
       |   (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
       | + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
       | + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
       | + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket FROM embeddings)
       |SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
       |       floor($cos * 10000 + 0.5) / 10000 AS cos_sim
       |FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       |WHERE floor($cos * 10000 + 0.5) / 10000 > 0.4
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  // --------------------------------------------------------------------
  // q61 — dedup clusters: connected components over the LSH candidate
  // pairs (TextDedup.connectedComponents, iterative min-label
  // propagation — one shuffle join per round, converges in ~diameter
  // rounds; dup clusters are near-cliques so 2-3 rounds). Completes the
  // fuzzy-dedup pipeline: signatures → candidate pairs → clusters →
  // keep-min-id. The oracle computes the same components via a
  // recursive-CTE transitive closure.
  def q61(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val pairs = graft.ext.TextDedup
      .lshCandidates(docs, "text", "doc_id", ngram = 3, numHashes = 4, bands = 1)
    graft.ext.TextDedup
      .connectedComponents(pairs, docs.select($"doc_id"), nodeCol = "doc_id")
      .orderBy($"node")
  }

  val q61Sql: String = {
    val ng = ngramsSql(3)
    s"""WITH RECURSIVE sig AS (
       | SELECT doc_id,
       |  ${minhashChunkSql(ng, 0)} || '|' || ${minhashChunkSql(ng, 1)} || '|' ||
       |  ${minhashChunkSql(ng, 2)} || '|' || ${minhashChunkSql(ng, 3)} AS band
       | FROM documents),
       | pairs AS (SELECT a.doc_id AS ia, b.doc_id AS ib
       |           FROM sig a JOIN sig b
       |             ON a.band = b.band AND a.doc_id < b.doc_id),
       | edges AS (SELECT ia AS a, ib AS b FROM pairs
       |           UNION SELECT ib, ia FROM pairs),
       | reach(src, dst) AS (
       |   SELECT a, b FROM edges
       |   UNION
       |   SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
       |SELECT d.doc_id AS node,
       |       least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS component
       |FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
       |GROUP BY d.doc_id ORDER BY node""".stripMargin
  }

  /** Name → query function, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_dedup_exact" -> (q18 _),
    "q19_minhash_signature" -> (q19 _),
    "q20_lsh_near_dup_pairs" -> (q20 _),
    "q21_ngram_jaccard" -> (q21 _),
    "q22_simhash" -> (q22 _),
    "q23_ann_cosine_topk" -> (q23 _),
    "q24_embedding_stats" -> (q24 _),
    "q25_ann_lsh_bucketed" -> (q25 _),
    "q26_lang_id" -> (q26 _),
    "q27_text_quality" -> (q27 _),
    "q28_doc_fingerprint" -> (q28 _),
    "q29_multimodal_meta" -> (q29 _),
    "q31_multimodal_decode" -> (q31 _),
    "q32_embedding_near_dup" -> (q32 _),
    "q61_dedup_clusters" -> (q61 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q18_dedup_exact" -> q18Sql,
    "q19_minhash_signature" -> q19Sql,
    "q20_lsh_near_dup_pairs" -> q20Sql,
    "q21_ngram_jaccard" -> q21Sql,
    "q22_simhash" -> q22Sql,
    "q23_ann_cosine_topk" -> q23Sql,
    "q24_embedding_stats" -> q24Sql,
    "q25_ann_lsh_bucketed" -> q25Sql,
    "q26_lang_id" -> q26Sql,
    "q27_text_quality" -> q27Sql,
    "q28_doc_fingerprint" -> q28Sql,
    "q29_multimodal_meta" -> q29Sql,
    "q31_multimodal_decode" -> q31Sql,
    "q32_embedding_near_dup" -> q32Sql,
    "q61_dedup_clusters" -> q61Sql
  )
}
