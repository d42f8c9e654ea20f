package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Round-7 extension queries: the remaining cluster-scale patterns a
  * 100 TB training-data pipeline leans on —
  *
  *  - q120 explicit bloom runtime-filter join (prefilter the fact scan
  *    with a ~MB sketch of the dim keys before the shuffle join);
  *  - q121 context-window document chunking (overlapping token windows,
  *    the tokenize-once → explode layout);
  *  - q122 temperature-based source resampling weights (the data-mixing
  *    step before training, integer/sqrt-exact for cross-engine parity);
  *  - q123 event-transition matrix (Markov transition counts + integer
  *    ppm probabilities, a sessionized-features staple);
  *  - q124 deterministic epoch shuffle (seeded hash order, sharded so no
  *    single reducer ever sees a whole epoch);
  *  - q125 multi-band MinHash LSH (b=2, r=2 — the recall knob of fuzzy
  *    dedup, exercising the banded path of TextDedup.lshCandidates).
  *
  * Numeric-parity doctrine as in Extended4: cross-row float accumulation
  * never feeds a rounded output; doubles appear only in per-row
  * correctly-rounded IEEE op chains (cast / divide / sqrt / multiply)
  * evaluated identically by both engines.
  */
object Extended5 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------------
  // q120 — EXPLICIT bloom runtime-filter join. The dim side (expensive
  // orders) builds a bloom filter in a scalar subquery — one small agg,
  // evaluated once, its ~MB binary value shipped to every scan task —
  // and `might_contain` prefilters lineitem AT THE SCAN, before any
  // shuffle. The exact semi join then removes bloom false positives, so
  // the result is EXACTLY the semi join and the oracle needs no bloom
  // at all. At 100 TB the bloom is the difference between shuffling
  // 600 B rows and shuffling only the ~5% that can survive the join;
  // Spark's own InjectRuntimeFilter does this opportunistically —
  // registering the internal expressions (GraftExtensions "bloom_agg" /
  // "might_contain") makes it a first-class user-facing operator.
  def q120(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("ord_q120")
    t(s, dir, "lineitem").createOrReplaceTempView("li_q120")
    s.sql(
      """WITH dim AS (SELECT o_orderkey FROM ord_q120 WHERE o_totalprice > 400000)
        |SELECT l.l_orderkey AS l_orderkey, count(*) AS n_items,
        |       CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty
        |FROM li_q120 l
        |WHERE might_contain((SELECT bloom_agg(xxhash64(o_orderkey)) FROM dim),
        |                    xxhash64(l.l_orderkey))
        |  AND l.l_orderkey IN (SELECT o_orderkey FROM dim)
        |GROUP BY l.l_orderkey
        |ORDER BY l_orderkey""".stripMargin)
  }

  val q120Sql: String =
    """SELECT l.l_orderkey AS l_orderkey, count(*) AS n_items,
      |       CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty
      |FROM lineitem l
      |WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders
      |                       WHERE o_totalprice > 400000)
      |GROUP BY l.l_orderkey
      |ORDER BY l_orderkey""".stripMargin

  // --------------------------------------------------------------------
  // q121 — context-window chunking: split each document into overlapping
  // token windows (size 32, stride 24, overlap 8) — the preprocessing
  // step that turns raw docs into model-context-sized training rows.
  // Tokenize ONCE, explode the window starts (start ≤ n - overlap keeps
  // tail coverage without fully-contained duplicate windows), slice per
  // start. Pure per-row scalar work + one explode: no shuffle except the
  // output sort, linear at any corpus size.
  def q121(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.ext.TrainPrep
      .chunk(t(s, dir, "documents"), "doc_id", "text",
        chunkSize = 32, stride = 24)
      .select($"doc_id", $"chunk_idx", $"start_token", $"n_tokens",
        $"chunk_hash")
      .orderBy($"doc_id", $"chunk_idx")
  }

  val q121Sql: String = {
    val toks = DocOps.tokensSql
    """WITH tok AS (SELECT doc_id, TOKS AS toks FROM documents),
      |st AS (SELECT doc_id, toks,
      |        unnest(generate_series(1, greatest(len(toks) - 8, 1), 24)) AS start
      |       FROM tok)
      |SELECT doc_id,
      |       (start - 1) // 24 AS chunk_idx,
      |       CAST(start AS BIGINT) AS start_token,
      |       CAST(len(list_slice(toks, start, start + 31)) AS BIGINT) AS n_tokens,
      |       md5(array_to_string(list_slice(toks, start, start + 31), ' ')) AS chunk_hash
      |FROM st ORDER BY doc_id, chunk_idx""".stripMargin
      .replace("TOKS", toks)
  }

  // --------------------------------------------------------------------
  // q122 — temperature resampling weights (T = 2, i.e. p^(1/2)): the
  // data-mixing step that upweights small sources before training.
  // Per-source char mass → share in ppm (integer div, exact) and
  // sqrt-temperature weight relative to the largest source. The only
  // doubles are a per-row chain of correctly-rounded IEEE ops
  // (int→double cast, one divide, sqrt, one multiply) — identical in
  // any engine — never a cross-row float sum. One tiny agg + a
  // broadcast 1-row join: agg-bound at any scale.
  def q122(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val per = t(s, dir, "documents")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("chars"))
    val tot = per.agg(sum($"chars").as("total_chars"),
      max($"chars").as("chars_max"))
    per.crossJoin(broadcast(tot))
      .select(
        $"source", $"n_docs", $"chars",
        expr("chars * 1000000 div total_chars").as("share_ppm"),
        floor(sqrt($"chars".cast("double") / $"chars_max") * 1e6)
          .as("weight_ppm"))
      .orderBy($"source")
  }

  val q122Sql: String =
    """WITH per AS (SELECT source, count(*) AS n_docs,
      |                    CAST(sum(n_chars) AS BIGINT) AS chars
      |             FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(chars) AS BIGINT) AS total_chars,
      |               max(chars) AS chars_max FROM per)
      |SELECT source, n_docs, chars,
      |       CAST(chars * 1000000 // total_chars AS BIGINT) AS share_ppm,
      |       CAST(floor(sqrt(CAST(chars AS DOUBLE) / chars_max) * 1000000.0)
      |            AS BIGINT) AS weight_ppm
      |FROM per, tot ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // q123 — event-type transition matrix: lag(event_type) per user in
  // (ts, event_id) order, then (prev, next) counts and integer ppm row
  // probabilities — the Markov-features staple of behavioral pipelines.
  // Two shuffles (user window, then the small transition agg); the
  // window partitions by user_id so no global sort ever happens.
  def q123(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(s, dir, "events")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum($"n").over(Window.partitionBy($"prev_type")))
      .select($"prev_type", $"event_type".as("next_type"), $"n",
        expr("n * 1000000 div row_total").as("prob_ppm"))
      .orderBy($"prev_type", $"next_type")
  }

  val q123Sql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id
      |                               ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |tr AS (SELECT prev_type, event_type AS next_type, count(*) AS n
      |       FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, n,
      |       CAST(n * 1000000 // sum(n) OVER (PARTITION BY prev_type)
      |            AS BIGINT) AS prob_ppm
      |FROM tr ORDER BY prev_type, next_type""".stripMargin

  // --------------------------------------------------------------------
  // q124 — deterministic epoch shuffle: reproducible per-epoch training
  // order via a seeded hash key, SHARDED (first hex byte of the key,
  // 256 shards) so a window never holds a whole epoch in one task —
  // the global order is shard-major + in-shard position, the standard
  // sharded-training-data layout. Same order on any cluster size, any
  // engine, any run — unlike rand()-based shuffles.
  def q124(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"epoch", $"shard").orderBy($"skey", $"doc_id")
    t(s, dir, "documents")
      .select($"doc_id", explode(array(lit(0), lit(1))).as("epoch"))
      .withColumn("skey",
        md5(concat($"epoch".cast("string"), lit(":"), $"doc_id".cast("string"))))
      .withColumn("shard", substring($"skey", 1, 2))
      .select($"epoch", $"shard",
        row_number().over(w).cast("long").as("position"), $"doc_id")
      .orderBy($"epoch", $"shard", $"position")
  }

  val q124Sql: String =
    """WITH e AS (SELECT doc_id, unnest([0, 1]) AS epoch FROM documents),
      |k AS (SELECT epoch, doc_id,
      |             md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS skey
      |      FROM e),
      |sh AS (SELECT epoch, doc_id, skey, substr(skey, 1, 2) AS shard FROM k)
      |SELECT epoch, shard,
      |       row_number() OVER (PARTITION BY epoch, shard
      |                          ORDER BY skey, doc_id) AS position,
      |       doc_id
      |FROM sh ORDER BY epoch, shard, position""".stripMargin

  // --------------------------------------------------------------------
  // q125 — multi-band MinHash LSH (b=2 bands of r=2 hashes): the recall
  // knob of fuzzy dedup — a pair collides if EITHER band matches, so
  // candidate recall rises (vs q20's single b=1, r=4 band) at the cost
  // of more candidates to verify. Same scale layout as q20: signatures
  // once, one shuffle on the band key, grouped in-bucket pair expansion,
  // distinct to merge cross-band collisions.
  def q125(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.ext.TextDedup
      .lshCandidates(t(s, dir, "documents"), "text", "doc_id",
        ngram = 3, numHashes = 4, bands = 2)
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"))
      .orderBy($"doc_a", $"doc_b")
  }

  val q125Sql: String = {
    val ng = DocOps.ngramsSql(3)
    def mh(i: Int) = DocOps.minhashChunkSql(ng, i)
    s"""WITH sig AS (
       | SELECT doc_id, ${mh(0)} AS mh0, ${mh(1)} AS mh1,
       |        ${mh(2)} AS mh2, ${mh(3)} AS mh3
       | FROM documents),
       |b AS (
       | SELECT doc_id, '0|' || mh0 || '|' || mh1 AS band FROM sig
       | UNION ALL
       | SELECT doc_id, '1|' || mh2 || '|' || mh3 AS band FROM sig)
       |SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
       |FROM b a JOIN b b2 ON a.band = b2.band AND a.doc_id < b2.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // --------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q120_bloom_prune_join" -> (q120 _),
    "q121_doc_chunking" -> (q121 _),
    "q122_temperature_mix" -> (q122 _),
    "q123_transition_matrix" -> (q123 _),
    "q124_epoch_shuffle" -> (q124 _),
    "q125_lsh_multiband" -> (q125 _))

  val oracles: Map[String, String] = Map(
    "q120_bloom_prune_join" -> q120Sql,
    "q121_doc_chunking" -> q121Sql,
    "q122_temperature_mix" -> q122Sql,
    "q123_transition_matrix" -> q123Sql,
    "q124_epoch_shuffle" -> q124Sql,
    "q125_lsh_multiband" -> q125Sql)
}
