package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Graph, VectorIndex}

/** Round-9 batch (q164–q166) — three pipeline stages a 100 TB curation
  * stack runs that the catalog still lacked:
  *
  *  - q164 Johnson–Lindenstrauss ±1 random projection (integer-exact
  *    dimensionality reduction — the pre-step that makes brute-force
  *    embedding scans affordable at k/d cost);
  *  - q165 label-propagation community detection (the graph-clustering
  *    stage between near-dup edges and corpus-level dedup decisions);
  *  - q166 inverted-index construction (token → capped posting list,
  *    the search-side artifact of a curation run).
  *
  * All three are engine-portable by construction: the JL matrix is
  * md5-derived (no RNG state), LPA is synchronous with a total-order
  * tie-break, and the posting list is an ORDER-BY string aggregation.
  */
object Extended15 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------------
  // q164 — JL random projection (VectorIndex.randomProject): 64-dim
  // float embeddings → 16-dim integer sketches via a deterministic ±1
  // md5 sign matrix. The gate aggregates each projected dimension
  // (sum, |sum|, sum of squares — all exact BIGINTs) and asserts the
  // JL norm-preservation property as a boolean: per-dim Σ y² must land
  // within 4× of Σ‖q‖² (E[y_j²] = ‖q‖² exactly for ±1 projections).
  //
  // Scale: per-row O(k·d) arithmetic with the sign matrix as a plan
  // literal — NO shuffle until the 16-group final agg; the quantized
  // integer domain (q88 doctrine) means no float partial-sum order to
  // diverge at any partitioning.
  private val jlK = 16
  private val jlD = 64
  private val jlSigns = VectorIndex.signMatrix(jlK, jlD, seed = "jl9")

  def q164(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val proj = VectorIndex.randomProject(
      t(s, dir, "embeddings"), "embedding", jlSigns, scale = 1000L)
    val qv = transform($"embedding",
      x => floor(x.cast("double") * 1000 + lit(0.5)).cast("long"))
    val sumq2 = proj
      .select(explode(qv).as("qi"))
      .agg(sum($"qi" * $"qi").as("sumq2"))
    proj
      .select(posexplode($"proj").as(Seq("pos", "y")))
      .select(($"pos" + 1).cast("long").as("j"), $"y")
      .groupBy($"j")
      .agg(sum($"y").as("sum_y"),
        sum(abs($"y")).as("sum_abs"),
        sum($"y" * $"y").as("sum_sq"))
      .crossJoin(broadcast(sumq2))
      .select($"j", $"sum_y", $"sum_abs", $"sum_sq",
        expr("sum_sq between sumq2 div 4 and sumq2 * 4").as("jl_ok"))
      .orderBy($"j")
  }

  private def signsSqlLit: String =
    jlSigns.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  val q164Sql: String =
    s"""WITH s AS (SELECT $signsSqlLit AS m),
       | q AS (SELECT vec_id, list_transform(embedding,
       |         x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv
       |       FROM embeddings),
       | proj AS (SELECT q.vec_id, j, SUM(qv[i] * m[j][i]) AS y
       |          FROM q, s, generate_series(1, $jlK) g1(j),
       |               generate_series(1, $jlD) g2(i)
       |          GROUP BY q.vec_id, j),
       | nq AS (SELECT CAST(SUM(qi * qi) AS BIGINT) AS sumq2
       |        FROM (SELECT unnest(qv) AS qi FROM q)),
       | per AS (SELECT j, CAST(SUM(y) AS BIGINT) AS sum_y,
       |                CAST(SUM(ABS(y)) AS BIGINT) AS sum_abs,
       |                CAST(SUM(y * y) AS BIGINT) AS sum_sq
       |         FROM proj GROUP BY j)
       |SELECT j, sum_y, sum_abs, sum_sq,
       |       (sum_sq BETWEEN sumq2 // 4 AND sumq2 * 4) AS jl_ok
       |FROM per, nq ORDER BY j""".stripMargin

  // --------------------------------------------------------------------
  // q165 — label-propagation communities (Graph.labelPropagation, 4
  // synchronous rounds) on the part co-order graph (parts sharing an
  // order, the q152/q160 graph). The gate summarizes the labeling so
  // any single node flipping community changes the hash: node count,
  // community count, largest community, Σ label, Σ node·label.
  //
  // The oracle unrolls the same 4 sync rounds (MATERIALIZED CTEs — the
  // q160 technique); the operator's early stop only skips rounds that
  // are provably identity, so fixed-round SQL and fixpoint operator
  // agree whenever either converges.
  def q165(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one-exchange group-collect edge build (Graph.coOccurrenceEdges,
    // r18); PINNED because labelPropagation's nbr union reads the edge
    // set twice — unpinned, the whole build ran once per union branch
    val e = graft.ext.Graph.coOccurrenceEdges(
      t(s, dir, "lineitem")
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")), "o", "p")
      .localCheckpoint()
    // earlyStop ON measured FASTER than fixed rounds here (4.9 vs 6.8 s
    // steady at sf0.1): the co-order graph converges before round 4, so
    // the probe's extra join+action per round buys back whole rounds.
    val labels = Graph.labelPropagation(e, maxRounds = 4,
      assumeCanonical = true)
    val sizes = labels.groupBy($"label").agg(count(lit(1)).as("sz"))
    val top = sizes.agg(max($"sz").as("max_sz"),
      count(lit(1)).as("n_comm"))
    labels
      .agg(count(lit(1)).as("n_nodes"),
        sum($"label").as("label_sum"),
        sum($"node" * $"label").as("checksum"))
      .crossJoin(broadcast(top))
      .select($"n_nodes", $"n_comm", $"max_sz", $"label_sum", $"checksum")
  }

  /** 4 unrolled synchronous LPA rounds; argmax = (count DESC, label
    * ASC), exactly the operator's window. */
  private def lpaUnrolledSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
             |            FROM lineitem),
             | e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
             |        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
             | nbr AS MATERIALIZED (SELECT u AS node, v AS nb FROM e0
             |        UNION ALL SELECT v, u FROM e0),
             | l0 AS (SELECT DISTINCT node, node AS label FROM nbr)""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s""",
               | c$r AS (SELECT n.node, l.label, count(*) AS c
               |        FROM nbr n JOIN l${r - 1} l ON l.node = n.nb
               |        GROUP BY n.node, l.label),
               | l$r AS MATERIALIZED (SELECT node, label FROM
               |        (SELECT node, label, row_number() OVER
               |           (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
               |         FROM c$r) WHERE rn = 1)""".stripMargin
    }
    sb ++= s"""
              |, sizes AS (SELECT label, count(*) AS sz FROM l$rounds GROUP BY label)
              |SELECT (SELECT count(*) FROM l$rounds) AS n_nodes,
              |       (SELECT count(*) FROM sizes) AS n_comm,
              |       (SELECT CAST(max(sz) AS BIGINT) FROM sizes) AS max_sz,
              |       (SELECT CAST(sum(label) AS BIGINT) FROM l$rounds) AS label_sum,
              |       (SELECT CAST(sum(node * label) AS BIGINT) FROM l$rounds) AS checksum""".stripMargin
    sb.toString
  }

  val q165Sql: String = lpaUnrolledSql(rounds = 4)

  // --------------------------------------------------------------------
  // q166 — inverted-index construction: token → (df, cf, capped posting
  // list) for the 20 highest-df tokens. The posting cap (12 doc ids)
  // is applied BEFORE any collection via a token-KEYED row_number
  // window — Spark rewrites the rank filter to WindowGroupLimit, so
  // each map task forwards at most 12 rows per token and the
  // collect_list is bounded by construction (never "collect the whole
  // posting then slice": a stopword's full posting list at 100 TB is
  // the corpus). Final top-20 is TakeOrderedAndProject (bounded), not
  // a global sort.
  def q166(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = t(s, dir, "documents")
      .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("token"))
    val dt = tok.distinct()
    val dfs = dt.groupBy($"token").agg(count(lit(1)).as("df"))
    val cfs = tok.groupBy($"token").agg(count(lit(1)).as("cf"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy($"token").orderBy($"doc_id")
    val posting = dt
      .withColumn("rn", row_number().over(byDoc))
      .filter($"rn" <= 12)
      .groupBy($"token")
      .agg(concat_ws(",", sort_array(collect_list($"doc_id"))).as("posting"))
    dfs.join(cfs, "token").join(posting, "token")
      .orderBy($"df".desc, $"token".asc)
      .limit(20)
      .select($"token", $"df", $"cf", $"posting")
  }

  val q166Sql: String =
    """WITH d AS (SELECT doc_id,
      |        regexp_split_to_array(trim(text), '\s+') AS tks FROM documents),
      | tok AS (SELECT doc_id, unnest(tks) AS token FROM d),
      | dt AS (SELECT DISTINCT doc_id, token FROM tok),
      | dfs AS (SELECT token, COUNT(*) AS df FROM dt GROUP BY token),
      | cfs AS (SELECT token, COUNT(*) AS cf FROM tok GROUP BY token),
      | capped AS (SELECT token, doc_id FROM
      |        (SELECT token, doc_id,
      |                row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
      |         FROM dt) WHERE rn <= 12),
      | post AS (SELECT token,
      |        string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS posting
      |        FROM capped GROUP BY token)
      |SELECT dfs.token AS token, df, cf, posting
      |FROM dfs JOIN cfs USING (token) JOIN post USING (token)
      |ORDER BY df DESC, token ASC LIMIT 20""".stripMargin

  // --------------------------------------------------------------------
  // q167 — IPF raking (TrainPrep.rake, 3 rounds): fit per-cell
  // (lang × source) sampling weights so the lang marginal is UNIFORM
  // and the source marginal follows a rank-proportional ramp — the
  // "rebalance the corpus mix" solver. All-integer ppm arithmetic
  // (floor div rescales, integer marginal sums) keeps the fixpoint
  // trajectory bit-identical across engines and partitionings; the
  // oracle unrolls the same 3 rounds of half-steps. The rank window
  // over DISTINCT sources is a bounded-domain orderBy (the q140
  // class — 20 values), documented here.
  def q167(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
    val langs = d.select($"lang").distinct()
    val langTgt = langs
      .crossJoin(broadcast(langs.agg(count(lit(1)).as("k"))))
      .select($"lang", expr("1000000 div k").as("t"))
    val srcs = d.select($"source").distinct()
    val srcTgt = srcs
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"source"))
        .cast("long"))
      .crossJoin(broadcast(srcs.agg(count(lit(1)).as("k"))))
      .select($"source", expr("2 * r * 1000000 div (k * (k + 1))").as("t"))
    graft.ext.TrainPrep
      .rake(d, Seq("lang", "source"), Seq(langTgt, srcTgt), rounds = 3)
      .select($"lang", $"source", $"n", $"w_ppm")
      .orderBy($"lang", $"source")
  }

  /** 3 unrolled IPF rounds (lang half-step then source half-step),
    * integer ppm floor arithmetic — exactly [[graft.ext.TrainPrep.rake]]. */
  private def rakeUnrolledSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH cells0 AS (SELECT lang, source, count(*) AS n
             |        FROM documents GROUP BY lang, source),
             | tot AS (SELECT SUM(n) AS nn FROM cells0),
             | w0 AS MATERIALIZED (SELECT lang, source, n,
             |        n * 1000000 // nn AS w FROM cells0, tot),
             | tl AS (SELECT lang,
             |        1000000 // (SELECT count(DISTINCT lang) FROM documents) AS t
             |        FROM (SELECT DISTINCT lang FROM documents)),
             | ts AS (SELECT source, 2 * r * 1000000 // (k * (k + 1)) AS t
             |        FROM (SELECT source, row_number() OVER (ORDER BY source) AS r,
             |                     count(*) OVER () AS k
             |              FROM (SELECT DISTINCT source FROM documents)))""".stripMargin
    var prev = "w0"
    for (r <- 1 to rounds) {
      sb ++= s""",
               | ma$r AS (SELECT lang, SUM(w) AS m FROM $prev GROUP BY lang),
               | wa$r AS MATERIALIZED (SELECT p.lang, p.source, p.n,
               |        CASE WHEN m > 0 THEN w * t // m ELSE 0 END AS w
               |        FROM $prev p JOIN ma$r USING (lang) JOIN tl USING (lang)),
               | mb$r AS (SELECT source, SUM(w) AS m FROM wa$r GROUP BY source),
               | wb$r AS MATERIALIZED (SELECT p.lang, p.source, p.n,
               |        CASE WHEN m > 0 THEN w * t // m ELSE 0 END AS w
               |        FROM wa$r p JOIN mb$r USING (source) JOIN ts USING (source))""".stripMargin
      prev = s"wb$r"
    }
    sb ++= s"""
              |SELECT lang, source, n, CAST(w AS BIGINT) AS w_ppm FROM $prev
              |ORDER BY lang, source""".stripMargin
    sb.toString
  }

  val q167Sql: String = rakeUnrolledSql(rounds = 3)

  // --------------------------------------------------------------------
  // q168 — k-anonymity risk profile: equivalence classes over the
  // quasi-identifier tuple (lang, source, n_chars div 200); for each
  // k ∈ {2, 5, 10} report how many classes and rows fall below k —
  // the release-gate a privacy review runs before publishing a corpus.
  // One keyed class-size agg (map-side combinable), then the bounded
  // class-size frame × 3 thresholds — the k-explode happens on the
  // CLASS frame, never the corpus.
  def q168(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sizes = t(s, dir, "documents")
      .groupBy($"lang", $"source", expr("n_chars div 200").as("len_bucket"))
      .agg(count(lit(1)).as("sz"))
    sizes
      .select(explode(array(lit(2L), lit(5L), lit(10L))).as("k"), $"sz")
      .groupBy($"k")
      .agg(
        sum(when($"sz" < $"k", 1L).otherwise(0L)).as("n_classes_at_risk"),
        sum(when($"sz" < $"k", $"sz").otherwise(0L)).as("n_rows_at_risk"),
        count(lit(1)).as("n_classes"))
      .orderBy($"k")
  }

  val q168Sql: String =
    """WITH sizes AS (SELECT lang, source, n_chars // 200 AS len_bucket,
      |        count(*) AS sz
      |        FROM documents GROUP BY 1, 2, 3),
      | ks AS (SELECT unnest([2, 5, 10]) AS k)
      |SELECT CAST(k AS BIGINT) AS k,
      |       CAST(SUM(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_classes_at_risk,
      |       CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
      |         AS n_rows_at_risk,
      |       COUNT(*) AS n_classes
      |FROM sizes, ks GROUP BY k ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q169 — per-source distribution drift: total-variation distance (in
  // ppm, integer floor arithmetic) between each source's language mix
  // and the corpus-wide mix — the per-shard drift monitor a 100 TB
  // ingest runs to catch a crawl slice whose language profile shifted.
  // TVD = Σ|p - q| / 2 over the lang domain; both p and q are floored
  // ppm ratios of exact integer counts, so the metric is engine-exact
  // (no float division order). Two keyed aggs + a broadcast of the
  // BOUNDED per-lang corpus frame; missing (source, lang) cells
  // contribute q via the corpus side (p = 0).
  def q169(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
    val langs = d.groupBy($"lang").agg(count(lit(1)).as("cg"))
      .crossJoin(broadcast(d.agg(count(lit(1)).as("ng"))))
      .select($"lang", expr("cg * 1000000 div ng").as("q_ppm"))
    val perSource = d.groupBy($"source", $"lang").agg(count(lit(1)).as("cs"))
    val srcTotals = d.groupBy($"source").agg(count(lit(1)).as("ns"))
    // full source × lang grid (both frames bounded): a lang ABSENT
    // from a source still contributes its corpus mass to that source's
    // drift — a per-source join on lang alone would silently drop it
    srcTotals.crossJoin(broadcast(langs))
      .join(perSource, Seq("source", "lang"), "left")
      .select($"source",
        abs(expr("coalesce(cs, 0) * 1000000 div ns") - $"q_ppm").as("gap"))
      .groupBy($"source")
      .agg(expr("sum(gap) div 2").as("tvd_ppm"),
        count(lit(1)).as("n_langs"))
      .orderBy($"source")
  }

  val q169Sql: String =
    """WITH langs AS (SELECT lang,
      |        count(*) * 1000000 // (SELECT count(*) FROM documents) AS q_ppm
      |        FROM documents GROUP BY lang),
      | per_src AS (SELECT source, lang, count(*) AS cs
      |        FROM documents GROUP BY source, lang),
      | tot AS (SELECT source, count(*) AS ns FROM documents GROUP BY source),
      | grid AS (SELECT t.source, l.lang, l.q_ppm, t.ns,
      |        COALESCE(p.cs, 0) AS cs
      |        FROM tot t CROSS JOIN langs l
      |        LEFT JOIN per_src p ON p.source = t.source AND p.lang = l.lang)
      |SELECT source,
      |       CAST(SUM(ABS(cs * 1000000 // ns - q_ppm)) // 2 AS BIGINT)
      |         AS tvd_ppm,
      |       COUNT(*) AS n_langs
      |FROM grid GROUP BY source ORDER BY source""".stripMargin

  /** Name → query function, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q164_jl_projection" -> (q164 _),
    "q165_label_propagation" -> (q165 _),
    "q166_inverted_index" -> (q166 _),
    "q167_rake_mixing" -> (q167 _),
    "q168_k_anonymity" -> (q168 _),
    "q169_source_drift" -> (q169 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q164_jl_projection" -> q164Sql,
    "q165_label_propagation" -> q165Sql,
    "q166_inverted_index" -> q166Sql,
    "q167_rake_mixing" -> q167Sql,
    "q168_k_anonymity" -> q168Sql,
    "q169_source_drift" -> q169Sql
  )
}
