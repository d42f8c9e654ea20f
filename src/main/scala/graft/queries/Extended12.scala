package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Round-8 fourth batch (q156–q157):
  *
  *  - q156 pointwise mutual information between tokens and sources —
  *    the feature-association signal behind source classifiers and
  *    leakage audits, in floor-scaled integer micro-nats (q130's ln
  *    parity technique);
  *  - q157 bounded k-core peel — the iterative degree-threshold
  *    decomposition that strips low-connectivity fringe from a graph,
  *    3 declaratively-unrolled rounds (q134's pattern).
  */
object Extended12 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------------
  // q156 — token↔source PMI: which tokens are most associated with
  // which source — pmi = ln(n_ts·N / (n_t·n_s)) over document counts,
  // for the corpus top-20 vocabulary. Emitted in floor-scaled integer
  // MICRO-NATS: all four operands of the ln are exact integers, and
  // JVM Math.log / DuckDB ln agree bit-for-bit on this corpus (the
  // q130/q111 finding; the q130 guard-band spec technique pins the
  // residual floor-boundary risk).
  //
  // Scale: one distinct (doc, tok) shuffle; n_t / n_s / N are
  // driver-small broadcasts; PMI is per-row scalar math.
  def q156(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val tot = docs.agg(count(lit(1)).as("n_docs"))
    val tk = docs.select($"doc_id", $"source",
        explode(array_distinct(TextFns.tokens($"text"))).as("tok"))
      .distinct()
    val vocab = tk.select($"doc_id", $"tok").distinct()
      .groupBy($"tok").agg(count(lit(1)).as("n_t"))
      .orderBy($"n_t".desc, $"tok").limit(20)
    val perSrc = docs.groupBy($"source").agg(count(lit(1)).as("n_s"))
    tk.join(broadcast(vocab), "tok")
      .groupBy($"tok", $"n_t", $"source")
      .agg(count(lit(1)).as("n_ts"))
      .join(broadcast(perSrc), "source")
      .crossJoin(broadcast(tot))
      .select($"source", $"tok", $"n_ts",
        floor((log($"n_ts" * $"n_docs") - log($"n_t" * $"n_s")) * 1e6)
          .cast("long").as("pmi_micro"))
      .orderBy($"source", $"tok")
  }

  val q156Sql: String = {
    val toks = DocOps.tokensSql
    s"""WITH tk AS (SELECT DISTINCT doc_id, source, unnest(list_distinct($toks)) AS tok
       |            FROM documents),
       | vocab AS (SELECT tok, count(DISTINCT doc_id) AS n_t FROM tk
       |           GROUP BY tok ORDER BY n_t DESC, tok LIMIT 20),
       | src AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
       | n AS (SELECT count(*) AS n_docs FROM documents),
       | ts AS (SELECT tk.tok, tk.source, count(*) AS n_ts
       |        FROM tk JOIN vocab ON tk.tok = vocab.tok
       |        GROUP BY tk.tok, tk.source)
       |SELECT ts.source, ts.tok, ts.n_ts,
       |       CAST(floor((ln(ts.n_ts * n.n_docs) - ln(vocab.n_t * src.n_s))
       |                  * 1000000) AS BIGINT) AS pmi_micro
       |FROM ts JOIN vocab ON ts.tok = vocab.tok
       |JOIN src ON ts.source = src.source, n
       |ORDER BY ts.source, ts.tok""".stripMargin
  }

  // --------------------------------------------------------------------
  // q157 — bounded k-core peel (k = 100, 3 rounds) on the part
  // co-order graph: repeatedly drop nodes whose CURRENT degree is
  // below k — each round recomputes degrees on the surviving subgraph,
  // so removals cascade. Three declaratively-unrolled rounds (the
  // q134/q153 fixed-round pattern; a production decomposition loops
  // to fixpoint with the q61-style convergence guard). Reports the
  // shrinking frontier per round — the fringe-stripping curve.
  //
  // Scale: each round is one degree agg + one semi join on the edge
  // set; survivors-only edges carry forward, so work SHRINKS per
  // round; state pinned per round like every iterative operator here.
  def q157(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 100
    // one-exchange group-collect edge build (Graph.coOccurrenceEdges,
    // r18) — same canonical edge set as the old op self-join, two
    // fewer data-sized exchanges; and the keep lists are node-sized,
    // so the per-round semi joins BROADCAST (guide §3.1) — the peel
    // rounds stop shuffling the (shrinking) edge set twice per round
    val e0 = graft.ext.Graph.coOccurrenceEdges(
      t(s, dir, "lineitem")
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")), "o", "p")
      .localCheckpoint()
    // Driver-loop peel (r18, the Graph.kCore pattern): the loop state
    // is the node keep-set, so each round is ONE job over the pinned
    // FULL adjacency (per-row count of neighbors still in the
    // broadcast keep-set == degree in the keep-induced subgraph)
    // instead of a degree materialize + two semi joins + a stats agg
    // per round. The per-round (n_nodes, n_removed) rows fall out of
    // the collected node-sized degree map: a node counts iff it keeps
    // >= 1 edge in the current subgraph, exactly the distributed deg
    // frame's membership.
    val adj = e0.select($"u".as("node"), $"v".as("nb"))
      .union(e0.select($"v".as("node"), $"u".as("nb")))
      .groupBy($"node").agg(collect_list($"nb").as("nbs"))
      .localCheckpoint()
    var keep = new java.util.HashSet[java.lang.Long]()
    adj.select($"node").collect().foreach(r => keep.add(r.getLong(0)))
    var stats = Seq.empty[(Long, Long, Long)]
    for (round <- 1 to 3) {
      val bc = s.sparkContext.broadcast(keep)
      val degIn = udf((node: Long, nbs: Seq[Long]) => {
        val ks = bc.value
        if (!ks.contains(node)) -1L
        else {
          var c = 0L
          var i = 0
          while (i < nbs.length) {
            if (ks.contains(nbs(i))) c += 1
            i += 1
          }
          c
        }
      })
      val degs = adj.select($"node", degIn($"node", $"nbs"))
        .collect().filter(_.getLong(1) >= 1) // nodes with >= 1 live edge
      bc.unpersist(false)
      stats = stats :+ ((round.toLong, degs.length.toLong,
        degs.count(_.getLong(1) < k).toLong))
      val next = new java.util.HashSet[java.lang.Long]()
      degs.foreach(r => if (r.getLong(1) >= k) next.add(r.getLong(0)))
      keep = next
    }
    stats.toDF("round", "n_nodes", "n_removed").orderBy($"round")
  }

  val q157Sql: String =
    """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      |            FROM lineitem),
      | e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
      |        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
      | d1 AS (SELECT n, count(*) AS d FROM
      |        (SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0)
      |        GROUP BY n),
      | k1 AS (SELECT n FROM d1 WHERE d >= 100),
      | e1 AS (SELECT u, v FROM e0
      |        WHERE u IN (SELECT n FROM k1) AND v IN (SELECT n FROM k1)),
      | d2 AS (SELECT n, count(*) AS d FROM
      |        (SELECT u AS n FROM e1 UNION ALL SELECT v FROM e1)
      |        GROUP BY n),
      | k2 AS (SELECT n FROM d2 WHERE d >= 100),
      | e2 AS (SELECT u, v FROM e1
      |        WHERE u IN (SELECT n FROM k2) AND v IN (SELECT n FROM k2)),
      | d3 AS (SELECT n, count(*) AS d FROM
      |        (SELECT u AS n FROM e2 UNION ALL SELECT v FROM e2)
      |        GROUP BY n)
      |SELECT CAST(1 AS BIGINT) AS round,
      |       (SELECT count(*) FROM d1) AS n_nodes,
      |       (SELECT count(*) FROM d1 WHERE d < 100) AS n_removed
      |UNION ALL SELECT CAST(2 AS BIGINT),
      |       (SELECT count(*) FROM d2),
      |       (SELECT count(*) FROM d2 WHERE d < 100)
      |UNION ALL SELECT CAST(3 AS BIGINT),
      |       (SELECT count(*) FROM d3),
      |       (SELECT count(*) FROM d3 WHERE d < 100)
      |ORDER BY round""".stripMargin

  // --------------------------------------------------------------------
  // q158 — exact distributed AUC (Mann–Whitney U): how well n_chars
  // separates English from non-English docs — the classifier-eval
  // metric, computed EXACTLY at any scale. AUC = (Σ_pos avg_rank −
  // np(np+1)/2) / (np·nn); ties get average ranks. Everything stays
  // integer by doubling: a score value spanning ranks
  // [cum_before+1, cum_before+cnt] has 2·avg_rank = 2·cum_before +
  // cnt + 1, so U2 = Σ_pos 2·avg_rank − np(np+1) and
  // auc_ppm = U2·10⁶ div (2·np·nn) — no float anywhere.
  //
  // Scale: raw rows only feed a per-score (cnt, n_pos) agg; the
  // cumulative count over the DISTINCT-score domain comes from
  // GlobalRank.withPrefixSum — range-partition + two passes, NEVER an
  // unpartitioned window. (The first cut used `Window.orderBy(score)`
  // arguing the distinct domain is small; true for integer n_chars,
  // false for the real-valued classifier scores AUC exists for, where
  // distinct ≈ row count — a one-task funnel. QueryPlanSpec pins the
  // windowless plan.) No global sort of the dataset, no
  // single-partition stage, ever.
  def q158(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perScore = t(s, dir, "documents")
      .select($"n_chars".as("score"),
        when($"lang" === "en", 1L).otherwise(0L).as("pos"))
      .groupBy($"score")
      .agg(count(lit(1)).as("cnt"), sum($"pos").as("n_pos"))
    graft.operators.GlobalRank
      .withPrefixSum(perScore, Seq($"score"), "cnt", "cum_before")
      .agg(
        sum($"n_pos").as("np"),
        sum($"cnt" - $"n_pos").as("nn"),
        sum($"n_pos" * ($"cum_before" * 2 + $"cnt" + 1)).as("r2_pos"))
      .select($"np", $"nn",
        ($"r2_pos" - $"np" * ($"np" + 1)).as("u2"),
        expr("(r2_pos - np * (np + 1)) * 1000000 div (2 * np * nn)")
          .as("auc_ppm"))
  }

  val q158Sql: String =
    """WITH ps AS (SELECT n_chars AS score, count(*) AS cnt,
      |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_pos
      |  FROM documents GROUP BY n_chars),
      | c AS (SELECT score, cnt, n_pos,
      |         coalesce(sum(cnt) OVER (ORDER BY score
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS cum_before
      |       FROM ps),
      | agg AS (SELECT CAST(sum(n_pos) AS BIGINT) AS np,
      |                CAST(sum(cnt - n_pos) AS BIGINT) AS nn,
      |                CAST(sum(n_pos * (cum_before * 2 + cnt + 1))
      |                     AS BIGINT) AS r2_pos
      |         FROM c)
      |SELECT np, nn, CAST(r2_pos - np * (np + 1) AS BIGINT) AS u2,
      |       CAST((r2_pos - np * (np + 1)) * 1000000 // (2 * np * nn)
      |            AS BIGINT) AS auc_ppm
      |FROM agg""".stripMargin

  /** Name → query function, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q156_token_source_pmi" -> (q156 _),
    "q157_kcore_peel" -> (q157 _),
    "q158_exact_auc" -> (q158 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q156_token_source_pmi" -> q156Sql,
    "q157_kcore_peel" -> q157Sql,
    "q158_exact_auc" -> q158Sql
  )
}
