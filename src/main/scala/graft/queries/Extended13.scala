package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.QuantileSketch

/** Round-9 batch (q159–q160):
  *
  *  - q159 mergeable quantile sketch — per-shard sketch → merge →
  *    quantile query, the shard-then-merge distribution profile beside
  *    q117 (HLL distinct) and q147 (Count-Min frequencies);
  *  - q160 k-core to FIXPOINT via the ext/Graph.kCore library operator
  *    (q157 remains the fixed-depth peel-curve instance).
  */
object Extended13 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------------
  // q159 — mergeable quantile sketch (DDSketch-style log buckets,
  // α = 1%): 8 shard-local sketches of lineitem price cents merge into
  // one corpus sketch (bucket-count sums — deterministic under any
  // merge order, unlike KLL/t-digest compaction), then 6 quantiles
  // read back from bucket midpoints. The CHECKED output is the q117
  // technique: exact lower-quantile values (integer-exact rank rule,
  // cross-engine identical) plus a boolean asserting each estimate
  // landed within its published α relative-error envelope (small
  // slack for float boundary assignment).
  //
  // Scale: the sketch agg is map-side combinable; merge touches sketch
  // rows only; the quantile walk collapses the BOUNDED bucket frame
  // (≈ln(max/min)/ln γ rows) to one array row. The exact side (gate
  // only — a production job ships just the sketch) is a per-value agg
  // + GlobalRank prefix sum: windowless, no global sort.
  def q159(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val alpha = 0.01
    val qs = Seq(10, 250, 500, 750, 900, 990)
    val vals = t(s, dir, "lineitem")
      .select(floor($"l_extendedprice" * 100 + 0.5).cast("long").as("cents"),
        pmod(hash($"l_orderkey"), lit(8)).as("shard"))
    val perShard = QuantileSketch.sketch(vals, "cents", alpha, Seq("shard"))
    val merged = QuantileSketch.merge(perShard)
    val est = QuantileSketch.quantiles(merged, alpha, qs)
    val perVal = vals.groupBy($"cents").agg(count(lit(1)).as("cnt"))
    val withCum = graft.operators.GlobalRank
      .withPrefixSum(perVal, Seq($"cents"), "cnt", "cum_before")
    val exact = withCum
      .crossJoin(broadcast(est.select($"q_permille", $"n")))
      .filter($"cum_before" + $"cnt" >= expr("(q_permille * n + 999) div 1000"))
      .groupBy($"q_permille").agg(min($"cents").as("exact_cents"))
    est.join(exact, "q_permille")
      .select($"q_permille", $"exact_cents", $"n",
        (abs($"est" - $"exact_cents".cast("double")) <=
          lit(alpha * 1.02) * $"exact_cents".cast("double")).as("within_bound"))
      .orderBy($"q_permille")
  }

  val q159Sql: String =
    """WITH v AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |             AS cents FROM lineitem),
      | n AS (SELECT count(*) AS n FROM v),
      | pv AS (SELECT cents, count(*) AS cnt FROM v GROUP BY cents),
      | c AS (SELECT cents, sum(cnt) OVER (ORDER BY cents) AS cum FROM pv),
      | qs AS (SELECT unnest([10, 250, 500, 750, 900, 990]) AS q)
      |SELECT CAST(q.q AS BIGINT) AS q_permille,
      |       (SELECT min(c.cents) FROM c, n
      |        WHERE c.cum >= (q.q * n.n + 999) // 1000) AS exact_cents,
      |       (SELECT CAST(n AS BIGINT) FROM n) AS n,
      |       TRUE AS within_bound
      |FROM qs q ORDER BY q_permille""".stripMargin

  // --------------------------------------------------------------------
  // q160 — k-core FIXPOINT (ext/Graph.kCore, k = 80) on the part
  // co-order graph: unlike q157's fixed 3-round peel report, this runs
  // the library operator to CONVERGENCE and summarizes the final core
  // (node count, degree sum, min degree — provably ≥ k — and a
  // node-weighted checksum so any membership/degree flip changes the
  // hash). The oracle unrolls enough peel rounds that the SQL chain
  // reaches the same fixpoint (extra rounds are no-ops once converged;
  // GraphSpec proves the operator == brute-force peel on random
  // graphs, so the unroll depth is the only sf-specific choice).
  //
  // Scale: each round is one degree agg + two semi joins on a
  // SHRINKING edge set, state pinned per round; convergence is a
  // filter on materialized degrees (no extra join). See Graph.kCore.
  def q160(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one-exchange group-collect edge build (Graph.coOccurrenceEdges,
    // r18) — same canonical edge set as the old op self-join, two
    // fewer data-sized exchanges
    val e = graft.ext.Graph.coOccurrenceEdges(
      t(s, dir, "lineitem")
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")), "o", "p")
    val core = graft.ext.Graph.kCore(e, k = 80, assumeCanonical = true)
    core.agg(
      count(lit(1)).as("n_nodes"),
      coalesce(sum($"degree"), lit(0L)).as("degree_sum"),
      coalesce(min($"degree"), lit(0L)).as("min_degree"),
      coalesce(sum($"node" * $"degree"), lit(0L)).as("checksum"))
  }

  /** Peel-to-fixpoint oracle: `rounds` unrolled degree+filter rounds —
    * must be ≥ the peel depth at the gate's scale factor; extra rounds
    * are identity once converged. */
  private def kcoreUnrolledSql(k: Int, rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
             |            FROM lineitem),
             | e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
             |        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s""",
               | d$r AS MATERIALIZED (SELECT n, count(*) AS d FROM
               |        (SELECT u AS n FROM e${r - 1} UNION ALL SELECT v FROM e${r - 1})
               |        GROUP BY n),
               | k$r AS MATERIALIZED (SELECT n FROM d$r WHERE d >= $k),
               | e$r AS MATERIALIZED (SELECT u, v FROM e${r - 1}
               |        WHERE u IN (SELECT n FROM k$r)
               |          AND v IN (SELECT n FROM k$r))""".stripMargin
    }
    sb ++= s"""
              |, df AS (SELECT n, count(*) AS d FROM
              |        (SELECT u AS n FROM e$rounds UNION ALL SELECT v FROM e$rounds)
              |        GROUP BY n)
              |SELECT count(*) AS n_nodes,
              |       coalesce(CAST(sum(d) AS BIGINT), 0) AS degree_sum,
              |       coalesce(CAST(min(d) AS BIGINT), 0) AS min_degree,
              |       coalesce(CAST(sum(n * d) AS BIGINT), 0) AS checksum
              |FROM df""".stripMargin
    sb.toString
  }

  val q160Sql: String = kcoreUnrolledSql(k = 80, rounds = 7)

  /** Name → query function, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q159_quantile_sketch" -> (q159 _),
    "q160_kcore_fixpoint" -> (q160 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q159_quantile_sketch" -> q159Sql,
    "q160_kcore_fixpoint" -> q160Sql
  )
}
