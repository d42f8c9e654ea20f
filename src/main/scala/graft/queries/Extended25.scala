package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Exact

/** Round-14 second batch (q238–q240): the comparison / fairness /
  * concentration read-outs that close out the evaluation shelf —
  * does the classifier serve every cohort equally (q238), is the
  * wide model ACTUALLY better than the narrow one on paired data
  * (q239), and how concentrated is the corpus without paying a
  * global sort for it (q240, the one-scan complement to q232's
  * ranked Gini).
  */
object Extended25 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------------
  // q238 — equal-opportunity gap across synthetic cohorts (vec_id mod 3
  // — deterministic, both engines derive it): per-group balanced
  // accuracy of the centroid classifier plus the max−min gap row.
  def q238(s: SparkSession, dir: String): DataFrame = {
    val p = graft.ext.Eval.centroidPredictions(
      t(s, dir, "embeddings"), "embedding", "label")
      .withColumn("grp", (col("vec_id") % 3).cast("int"))
    graft.ext.Eval.groupBalancedAccuracyPpm(p, "label", "pred", "grp")
  }

  val q238Sql: String =
    s"""WITH ${CentroidPredOracle.chain},
       | rc AS (SELECT CAST(vec_id % 3 AS INTEGER) AS grp,
       |          count(*) AS nt,
       |          (CAST(sum(CASE WHEN label = pred THEN 1 ELSE 0 END)
       |             AS BIGINT) * 1000000) // count(*) AS recall_ppm
       |        FROM pred GROUP BY 1, label),
       | per AS (SELECT grp AS "group", CAST(sum(nt) AS BIGINT) AS n,
       |           count(*) AS n_classes,
       |           CAST(sum(recall_ppm) AS BIGINT) // count(*) AS bacc_ppm
       |         FROM rc GROUP BY 1)
       |SELECT * FROM per
       |UNION ALL
       |SELECT CAST(-1 AS INTEGER), CAST(sum(n) AS BIGINT), count(*),
       |  max(bacc_ppm) - min(bacc_ppm)
       |FROM per
       |ORDER BY "group"""".stripMargin

  // --------------------------------------------------------------------
  // q239 — McNemar's paired test between the width-16 and width-64
  // Matryoshka classifiers (q223's raters): the disagreement cells
  // b/c and the continuity-corrected statistic in micro units —
  // "does full width beat the 16-prefix beyond chance?" One scan
  // (both predictions come from the same fused classification pass).
  private val McnWidths = Seq(16, 64)

  def q239(s: SparkSession, dir: String): DataFrame = {
    val multi = graft.ext.Eval.multiWidthPredictions(
      t(s, dir, "embeddings"), "embedding", "label", McnWidths)
    graft.ext.Eval.mcnemarMicro(multi, "label",
      s"pred_w${McnWidths.head}", s"pred_w${McnWidths.last}")
  }

  val q239Sql: String = {
    val (wa, wb) = (McnWidths.head, McnWidths.last)
    s"""WITH ${CentroidPredOracle.widthChains(McnWidths)},
       | paired AS (SELECT e.label, pred$wa.p$wa AS a, pred$wb.p$wb AS b
       |            FROM e JOIN pred$wa USING (vec_id)
       |            JOIN pred$wb USING (vec_id)),
       | f AS (SELECT count(*) AS n,
       |   CAST(sum(CASE WHEN a = label AND b <> label THEN 1 ELSE 0 END)
       |     AS BIGINT) AS b,
       |   CAST(sum(CASE WHEN a <> label AND b = label THEN 1 ELSE 0 END)
       |     AS BIGINT) AS c
       |   FROM paired)
       |SELECT n, b, c,
       |  CAST(CASE WHEN b + c = 0 THEN 0 ELSE
       |    ((abs(b - c) - 1) * (abs(b - c) - 1) * 1000000) // (b + c)
       |  END AS BIGINT) AS mcnemar_micro
       |FROM f""".stripMargin
  }

  // --------------------------------------------------------------------
  // q240 — Theil T index of document-length concentration: the
  // one-scan complement to q232's Gini (Gini needs a GLOBAL RANK —
  // two range-partitioned passes; Theil is a plain aggregation, the
  // form to prefer at 100 TB when any inequality read-out will do).
  // T = (1/n) Σ r·ln r with r = x·n/X; per-row terms nano-floored
  // before the exact integer sum (the q178/q220 log discipline), the
  // sum in DECIMAL (one mega-doc makes r·ln r ~ n·ln n). Zero-length
  // docs carry r = 0 and contribute 0 (lim x→0 x·ln x), encoded
  // explicitly on both engines.
  def q240(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents").select($"n_chars".cast("long").as("x"))
    val tot = d.agg(count(lit(1)).as("n"), sum($"x").as("xs"))
    d.crossJoin(tot)
      .select(expr("CASE WHEN x > 0 THEN CAST(floor(" +
        "((CAST(x AS DOUBLE) * n) / xs) *" +
        " ln((CAST(x AS DOUBLE) * n) / xs) * 1000000000.0 + 0.5)" +
        " AS BIGINT) ELSE 0L END").as("t"))
      .agg(count(lit(1)).as("n"), Exact.decSum($"t").as("tsum"))
      .select($"n",
        expr("tsum div n").as("theil_nano"))
  }

  val q240Sql: String =
    """WITH d AS (SELECT CAST(n_chars AS BIGINT) AS x FROM documents),
      | tot AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS xs FROM d),
      | terms AS (SELECT CASE WHEN x > 0 THEN CAST(floor(
      |     ((CAST(x AS DOUBLE) * n) / xs) *
      |     ln((CAST(x AS DOUBLE) * n) / xs) * 1000000000.0 + 0.5)
      |     AS BIGINT) ELSE 0 END AS t
      |   FROM d CROSS JOIN tot)
      |SELECT count(*) AS n,
      |  CAST(CAST(sum(t) AS HUGEINT) // count(*) AS BIGINT) AS theil_nano
      |FROM terms""".stripMargin

  // --------------------------------------------------------------------
  // q241 — HIERARCHICAL SemDeDup (q215 with sign-LSH sub-bucketing):
  // the within-cell all-pairs keys on (cell, sub-bucket) so pair
  // volume divides by ~2^subBits — the Stress `semdd` pricing found
  // affordable-k cells detonating at 4M (3.1e10 pairs) and this is
  // the operator-side fix. subBits is DERIVED from corpus size by the
  // occupancy law (VectorIndex.occupancySubBits: largest b with
  // k·occ·2^b ≤ n — a hard-coded value re-opened the n²/k blow-up at
  // 100×, the r14 verdict's point), and the derivation is INTEGRAL so
  // the oracle replays it exactly with a generate_series scan; the
  // occupancy target is gate-fixture sized (500 vecs at sf0.01 —
  // production corpora use the operator default 64). The sub-bucket
  // itself is a deterministic sign function of the vector; comparing
  // q241's per-cell drops against q215's reads the recall cost of
  // the geometry on this corpus.
  private val HierK = 8
  private val HierOccTarget = 16
  private val HierMaxBits = 16

  def q241(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    // one bounded count job prices the dial; the value is metadata
    val subBits = graft.ext.VectorIndex.occupancySubBits(
      e.count(), k = HierK, occTarget = HierOccTarget,
      maxBits = HierMaxBits)
    val centroids = graft.ext.VectorIndex
      .trainCentroids(e, "embedding", k = HierK, iterations = 2)
    graft.ext.VectorIndex
      .semanticDedupClustered(e, "embedding", "vec_id", centroids,
        tauBp = 4200, subBits = subBits)
      .groupBy($"cell")
      .agg(count(lit(1)).as("n_members"),
        sum(when(!$"keep", 1L).otherwise(0L)).as("n_dropped"))
      .orderBy($"cell")
  }

  // sb replays occupancySubBits integrally (largest b in [0, maxBits]
  // with k·occ·2^b ≤ n, else 0); sub folds the first `bits` sign bits
  // dynamically via generate_series — identical value by exact
  // integer arithmetic at ANY scale factor, no float log knife-edge.
  val q241Sql: String =
    s"""WITH ${KmeansOracle.chain(k = HierK, iterations = 2)},
       | sb AS (SELECT COALESCE((SELECT max(b)
       |     FROM generate_series(0, $HierMaxBits) t(b)
       |     WHERE ${HierK * HierOccTarget} * (1::BIGINT << CAST(b AS INTEGER))
       |       <= (SELECT count(*) FROM e)), 0) AS bits),
       | m AS (SELECT e.vec_id, af.cell, e.v,
       |     COALESCE(list_sum(list_transform(range(1, sb.bits + 1),
       |       i -> CASE WHEN e.v[CAST(i AS INTEGER)] >= 0
       |            THEN (1::BIGINT << CAST(i - 1 AS INTEGER))
       |            ELSE 0::BIGINT END)), 0) AS sub
       |   FROM e JOIN af USING (vec_id) CROSS JOIN sb),
       | dropped AS (SELECT DISTINCT b.vec_id AS vid
       |   FROM m a JOIN m b ON a.cell = b.cell AND a.sub = b.sub
       |     AND a.vec_id < b.vec_id
       |   WHERE floor(${KmeansOracle.cos("a.v", "b.v")} * 10000 + 0.5)
       |     >= 4200)
       |SELECT m.cell, count(*) AS n_members,
       |  CAST(sum(CASE WHEN d.vid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dropped
       |FROM m LEFT JOIN dropped d ON m.vec_id = d.vid
       |GROUP BY m.cell ORDER BY m.cell""".stripMargin

  // --------------------------------------------------------------------
  // q242 — Cochran's Q across the width-16/32/64 Matryoshka
  // classifiers: "are ANY of the k paired classifiers different beyond
  // chance?" — the omnibus test run before pairwise McNemar (q239).
  // One scan: R_i is a row expression, the C_j are conditional sums in
  // the same aggregation.
  private val CochranWidths = Seq(16, 32, 64)

  def q242(s: SparkSession, dir: String): DataFrame = {
    val multi = graft.ext.Eval.multiWidthPredictions(
      t(s, dir, "embeddings"), "embedding", "label", CochranWidths)
    graft.ext.Eval.cochranQMicro(multi, "label",
      CochranWidths.map(w => s"pred_w$w"))
  }

  val q242Sql: String = {
    val ws = CochranWidths
    val joined = ws.map(w => s"pred$w").reduce((a, b) => s"$a JOIN $b USING (vec_id)")
    val ok = ws.map(w => s"(CASE WHEN p$w = label THEN 1 ELSE 0 END)")
    val ri = ok.mkString(" + ")
    val cs = ws.indices.map(j =>
      s"CAST(sum(${ok(j)}) AS HUGEINT) AS c$j").mkString(",\n       |   ")
    val csq = ws.indices.map(j => s"c$j * c$j").mkString(" + ")
    val k = ws.length
    s"""WITH ${CentroidPredOracle.widthChains(ws)},
       | paired AS (SELECT e.label, ${ws.map(w => s"p$w").mkString(", ")}
       |            FROM e JOIN $joined USING (vec_id)),
       | f AS (SELECT count(*) AS n_items,
       |   CAST(sum($ri) AS HUGEINT) AS t,
       |   CAST(sum(CAST(($ri) AS HUGEINT) * ($ri)) AS HUGEINT) AS r2,
       |   $cs
       |   FROM paired)
       |SELECT n_items, CAST($k AS BIGINT) AS n_raters,
       |  CAST(t AS BIGINT) AS t,
       |  CAST(CASE WHEN $k * t - r2 = 0 THEN 0 ELSE
       |    (${k - 1} * ($k * ($csq) - t * t) * 1000000) // ($k * t - r2)
       |  END AS BIGINT) AS q_micro
       |FROM f""".stripMargin
  }

  // --------------------------------------------------------------------
  // q243 — Krippendorff's alpha (nominal, complete data) over the same
  // three width-raters: the coincidence-based agreement statistic
  // (raters interchangeable), complementing q223's Fleiss kappa with a
  // different chance model. Exact ppm; D_e folds via
  // Σ n_c(n−n_c) = (Σn_c)² − Σn_c² (one aggregation).
  def q243(s: SparkSession, dir: String): DataFrame = {
    val multi = graft.ext.Eval.multiWidthPredictions(
      t(s, dir, "embeddings"), "embedding", "label", CochranWidths)
    graft.ext.Eval.krippendorffAlphaPpm(multi,
      CochranWidths.map(w => s"pred_w$w"))
  }

  val q243Sql: String = {
    val ws = CochranWidths
    val r = ws.length
    val joined = ws.map(w => s"pred$w").reduce((a, b) => s"$a JOIN $b USING (vec_id)")
    val agree = (for { i <- 0 until r; j <- (i + 1) until r } yield
      s"(CASE WHEN p${ws(i)} = p${ws(j)} THEN 1 ELSE 0 END)").mkString(" + ")
    val vals = ws.map(w => s"p$w").mkString(", ")
    s"""WITH ${CentroidPredOracle.widthChains(ws)},
       | paired AS (SELECT ${ws.map(w => s"p$w").mkString(", ")}
       |            FROM $joined),
       | s2 AS (SELECT count(*) AS n_items,
       |          CAST(sum($r + 2 * ($agree)) AS HUGEINT) AS s2
       |        FROM paired),
       | marg AS (SELECT v, count(*) AS nc
       |          FROM (SELECT unnest([$vals]) AS v FROM paired)
       |          GROUP BY 1),
       | de AS (SELECT CAST(sum(nc) AS HUGEINT) AS nn,
       |          CAST(sum(CAST(nc AS HUGEINT) * nc) AS HUGEINT) AS nc2
       |        FROM marg)
       |SELECT n_items, CAST($r AS BIGINT) AS n_raters,
       |  CAST(CASE WHEN nn * nn - nc2 = 0 THEN 1000000 ELSE
       |    1000000 - ((CAST(n_items AS HUGEINT) * ${r * r} - s2)
       |      * (n_items * $r - 1) * 1000000)
       |      // (${r - 1} * (nn * nn - nc2))
       |  END AS BIGINT) AS alpha_ppm
       |FROM s2 CROSS JOIN de""".stripMargin
  }

  /** Name → query, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q238_equal_opportunity_gap" -> (q238 _),
    "q239_mcnemar_paired" -> (q239 _),
    "q240_theil_index" -> (q240 _),
    "q241_semdedup_hier" -> (q241 _),
    "q242_cochran_q" -> (q242 _),
    "q243_krippendorff_alpha" -> (q243 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q238_equal_opportunity_gap" -> q238Sql,
    "q239_mcnemar_paired" -> q239Sql,
    "q240_theil_index" -> q240Sql,
    "q241_semdedup_hier" -> q241Sql,
    "q242_cochran_q" -> q242Sql,
    "q243_krippendorff_alpha" -> q243Sql
  )
}
