package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 batch (q219–q223): the evaluation shelf completed — the
  * derived classification / clustering quality metrics a labeling or
  * distillation pipeline reads after [[graft.ext.Eval]]'s confusion
  * matrix and Cohen's kappa (q217/q218):
  *
  *  - q219 per-class precision / recall / F1 in exact ppm integers
  *    plus a macro row — the per-class view the scalar kappa hides
  *    (a 95%-accurate classifier can still have a dead class).
  *
  *  - q220 normalized mutual information between the deterministic
  *    k-means cells (q49's trainCentroids/assignCells, k = 8, 2 Lloyd
  *    rounds) and the curated labels — "does unsupervised structure
  *    recover the labels?", the standard clustering-vs-ground-truth
  *    score. Per-cell log terms are nano-rounded BEFORE the exact
  *    integer sum, so partial-agg order can't move the read-out.
  *
  *  - q221 simplified (centroid-based) silhouette per label — cluster
  *    cohesion vs separation at O(n·k) (the classic pairwise form is
  *    an O(n²) self-join; this is the only shape that survives 100 TB).
  *    Distances expand to dot products so the hot loop is the native
  *    codegen'd [[graft.plans.FloatVectorDot]].
  *
  *  - q222 reliability table + expected calibration error: the
  *    centroid classifier's stated confidence (max cosine, micro
  *    units) priced against realized accuracy per confidence bin —
  *    the "is the score a probability?" QA every selection pipeline
  *    that thresholds on model confidence needs.
  *
  *  - q223 Fleiss' kappa over three Matryoshka-prefix "raters"
  *    (width-16/32/64 centroid classifiers, all served by ONE centroid
  *    aggregation and ONE scan): multi-rater agreement in exact ppm —
  *    how much fidelity the narrow prefixes lose is read as
  *    inter-rater disagreement.
  *
  * All five run on the embeddings fixture; every read-out is integer
  * (counts, ppm, nano) under the repo's cross-engine float discipline.
  */
object Extended22 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------------
  // q219 — per-class P/R/F1 (ppm) + macro row from the centroid
  // classifier's predictions.
  def q219(s: SparkSession, dir: String): DataFrame = {
    val p = graft.ext.Eval.centroidPredictions(
      t(s, dir, "embeddings"), "embedding", "label")
    graft.ext.Eval.perClassPrf1(p, "label", "pred")
  }

  val q219Sql: String =
    s"""WITH ${CentroidPredOracle.chain},
       | bt AS (SELECT label AS class, count(*) AS n_true,
       |          CAST(sum(CASE WHEN label = pred THEN 1 ELSE 0 END)
       |            AS BIGINT) AS tp
       |        FROM pred GROUP BY 1),
       | bp AS (SELECT pred AS class, count(*) AS n_pred
       |        FROM pred GROUP BY 1),
       | per AS (SELECT CAST(class AS INTEGER) AS class,
       |           coalesce(tp, 0) AS tp,
       |           coalesce(n_pred, 0) - coalesce(tp, 0) AS fp,
       |           coalesce(n_true, 0) - coalesce(tp, 0) AS fn
       |         FROM bt FULL OUTER JOIN bp USING (class)),
       | ppm AS (SELECT class, tp, fp, fn,
       |           CASE WHEN tp + fp > 0 THEN (tp * 1000000) // (tp + fp)
       |                ELSE 0 END AS precision_ppm,
       |           CASE WHEN tp + fn > 0 THEN (tp * 1000000) // (tp + fn)
       |                ELSE 0 END AS recall_ppm
       |         FROM per),
       | f1 AS (SELECT class, tp, fp, fn, precision_ppm, recall_ppm,
       |          CASE WHEN precision_ppm + recall_ppm > 0 THEN
       |            (2 * precision_ppm * recall_ppm)
       |              // (precision_ppm + recall_ppm)
       |          ELSE 0 END AS f1_ppm
       |        FROM ppm)
       |SELECT * FROM f1
       |UNION ALL
       |SELECT CAST(-1 AS INTEGER), CAST(sum(tp) AS BIGINT),
       |  CAST(sum(fp) AS BIGINT), CAST(sum(fn) AS BIGINT),
       |  CAST(sum(precision_ppm) AS BIGINT) // count(*),
       |  CAST(sum(recall_ppm) AS BIGINT) // count(*),
       |  CAST(sum(f1_ppm) AS BIGINT) // count(*)
       |FROM f1
       |ORDER BY class""".stripMargin

  // --------------------------------------------------------------------
  // q220 — NMI between deterministic k-means cells and the labels.
  def q220(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val cents = graft.ext.VectorIndex
      .trainCentroids(e, "embedding", k = 8, iterations = 2)
    val assigned = graft.ext.VectorIndex.assignCells(e, "embedding", cents)
    graft.ext.Eval.nmiPpm(assigned, "cell", "label")
  }

  val q220Sql: String =
    s"""WITH ${KmeansOracle.chain(k = 8, iterations = 2)},
       | m AS (SELECT af.cell AS u, emb.label AS v
       |       FROM af JOIN embeddings emb USING (vec_id)),
       | cells AS (SELECT u, v, count(*) AS nij FROM m GROUP BY 1, 2),
       | tot AS (SELECT count(*) AS n FROM m),
       | mi AS (SELECT CAST(coalesce(sum(CAST(floor(
       |     (CAST(nij AS DOUBLE) / CAST(n AS DOUBLE)) *
       |     ln((CAST(n AS DOUBLE) * CAST(nij AS DOUBLE)) /
       |        (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE))) *
       |     1000000000.0 + 0.5) AS BIGINT)), 0) AS BIGINT) AS mi_nano
       |   FROM cells
       |   JOIN (SELECT u, sum(nij) AS ni FROM cells GROUP BY 1) a USING (u)
       |   JOIN (SELECT v, sum(nij) AS nj FROM cells GROUP BY 1) b USING (v)
       |   CROSS JOIN tot),
       | hu AS (SELECT CAST(coalesce(sum(CAST(floor(
       |     -(CAST(nk AS DOUBLE) / CAST(n AS DOUBLE)) *
       |     ln(CAST(nk AS DOUBLE) / CAST(n AS DOUBLE)) *
       |     1000000000.0 + 0.5) AS BIGINT)), 0) AS BIGINT) AS h_left_nano
       |   FROM (SELECT u, count(*) AS nk FROM m GROUP BY 1) CROSS JOIN tot),
       | hv AS (SELECT CAST(coalesce(sum(CAST(floor(
       |     -(CAST(nk AS DOUBLE) / CAST(n AS DOUBLE)) *
       |     ln(CAST(nk AS DOUBLE) / CAST(n AS DOUBLE)) *
       |     1000000000.0 + 0.5) AS BIGINT)), 0) AS BIGINT) AS h_right_nano
       |   FROM (SELECT v, count(*) AS nk FROM m GROUP BY 1) CROSS JOIN tot)
       |SELECT n, mi_nano, h_left_nano, h_right_nano,
       |  CASE WHEN h_left_nano + h_right_nano > 0 THEN
       |    (2 * mi_nano * 1000000) // (h_left_nano + h_right_nano)
       |  ELSE 0 END AS nmi_ppm
       |FROM tot CROSS JOIN mi CROSS JOIN hu CROSS JOIN hv""".stripMargin

  // --------------------------------------------------------------------
  // q221 — simplified silhouette per label (+ overall row).
  def q221(s: SparkSession, dir: String): DataFrame =
    graft.ext.Eval.simplifiedSilhouette(
      t(s, dir, "embeddings"), "embedding", "label")

  val q221Sql: String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2]))"
    s"""WITH ${CentroidPredOracle.base},
       | sd AS (SELECT e.vec_id, e.label, c.cl,
       |          greatest((${dot("e.v", "e.v")}
       |            - 2.0 * ${dot("e.v", "c.c")})
       |            + ${dot("c.c", "c.c")}, 0.0) AS dd
       |        FROM e CROSS JOIN cents c),
       | ab AS (SELECT vec_id, label,
       |          sqrt(max(CASE WHEN cl = label THEN dd END)) AS a,
       |          sqrt(min(CASE WHEN cl <> label THEN dd END)) AS b
       |        FROM sd GROUP BY vec_id, label),
       | sil AS (SELECT CAST(label AS INTEGER) AS label,
       |           CAST(floor((CASE WHEN greatest(a, b) > 0.0
       |             THEN (b - a) / greatest(a, b) ELSE 0.0 END)
       |             * 1000000.0 + 0.5) AS BIGINT) AS s_ppm
       |         FROM ab)
       |SELECT label, count(*) AS n,
       |  CAST(sum(s_ppm) AS BIGINT) // count(*) AS mean_sil_ppm
       |FROM sil GROUP BY label
       |UNION ALL
       |SELECT CAST(-1 AS INTEGER), count(*),
       |  CAST(sum(s_ppm) AS BIGINT) // count(*)
       |FROM sil
       |ORDER BY label""".stripMargin
  }

  // --------------------------------------------------------------------
  // q222 — reliability bins + ECE for the centroid classifier.
  def q222(s: SparkSession, dir: String): DataFrame = {
    val scored = graft.ext.Eval.centroidScoredPredictions(
      t(s, dir, "embeddings"), "embedding", "label")
    graft.ext.Eval.calibrationBins(scored, "label", "pred", "conf_micro",
      bins = 10)
  }

  val q222Sql: String =
    s"""WITH ${CentroidPredOracle.chain},
       | scr AS (SELECT label, pred,
       |           CAST(floor(score * 1000000.0 + 0.5) AS BIGINT) AS cm
       |         FROM pred),
       | binned AS (SELECT
       |     greatest(least((cm * 10) // 1000000, 9), 0) AS bin,
       |     CASE WHEN label = pred THEN 1 ELSE 0 END AS ok, cm
       |   FROM scr),
       | per AS (SELECT bin, count(*) AS n,
       |           CAST(sum(ok) AS BIGINT) AS correct,
       |           (CAST(sum(ok) AS BIGINT) * 1000000) // count(*) AS acc_ppm,
       |           CAST(sum(cm) AS BIGINT) // count(*) AS conf_ppm
       |         FROM binned GROUP BY bin),
       | gapped AS (SELECT bin, n, correct, acc_ppm, conf_ppm,
       |              abs(acc_ppm - conf_ppm) AS gap_ppm FROM per)
       |SELECT * FROM gapped
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT), CAST(sum(n) AS BIGINT),
       |  CAST(sum(correct) AS BIGINT),
       |  CAST((sum(correct) * 1000000) // sum(n) AS BIGINT),
       |  CAST(sum(n * conf_ppm) // sum(n) AS BIGINT),
       |  CAST(sum(n * gap_ppm) // sum(n) AS BIGINT)
       |FROM gapped
       |ORDER BY bin""".stripMargin

  // --------------------------------------------------------------------
  // q223 — Fleiss' kappa over the width-16/32/64 Matryoshka raters.
  private val FleissWidths = Seq(16, 32, 64)

  def q223(s: SparkSession, dir: String): DataFrame = {
    val multi = graft.ext.Eval.multiWidthPredictions(
      t(s, dir, "embeddings"), "embedding", "label", FleissWidths)
    graft.ext.Eval.fleissKappaPpm(multi, "vec_id",
      FleissWidths.map(w => s"pred_w$w"))
  }

  val q223Sql: String = {
    val r = FleissWidths.length
    val preds = FleissWidths.map(w => s"pred$w")
    val joined = preds.tail.foldLeft(preds.head)((acc, p) =>
      s"$acc JOIN $p USING (vec_id)")
    val plist = FleissWidths.map(w => s"p$w").mkString(", ")
    s"""WITH ${CentroidPredOracle.widthChains(FleissWidths)},
       | ratings AS (SELECT vec_id, unnest([$plist]) AS r
       |             FROM (SELECT ${preds.head}.vec_id, $plist
       |                   FROM $joined)),
       | cellc AS (SELECT vec_id, r, count(*) AS c
       |           FROM ratings GROUP BY 1, 2),
       | s2 AS (SELECT CAST(sum(c * c) AS BIGINT) AS s2,
       |          CAST(count(DISTINCT vec_id) AS BIGINT) AS n_items
       |        FROM cellc),
       | marg AS (SELECT CAST(coalesce(sum(ck * ck), 0) AS BIGINT) AS ck2
       |   FROM (SELECT r, count(*) AS ck FROM ratings GROUP BY 1)),
       | folded AS (SELECT n_items, CAST($r AS BIGINT) AS n_raters,
       |     ((s2 - n_items * $r) * 1000000)
       |       // (n_items * $r * ${r - 1}) AS pbar_ppm,
       |     (ck2 * 1000000)
       |       // ((n_items * $r) * (n_items * $r)) AS pe_ppm
       |   FROM s2 CROSS JOIN marg)
       |SELECT n_items, n_raters, pbar_ppm, pe_ppm,
       |  CASE WHEN pe_ppm = 1000000 THEN 1000000 ELSE
       |    ((pbar_ppm - pe_ppm) * 1000000) // (1000000 - pe_ppm)
       |  END AS kappa_ppm
       |FROM folded""".stripMargin
  }

  // --------------------------------------------------------------------
  // q224 — pairwise linear-MMD² between label-group centroids
  // (ext/Drift): the cheapest embedding-space two-sample statistic —
  // ‖μ_A − μ_B‖² folds to ONE aggregation, so it's the form that
  // scales (quadratic kernels need pair samples). Micro-unit integers
  // over float-rounded means.
  def q224(s: SparkSession, dir: String): DataFrame =
    graft.ext.Drift.groupMeanShift(
      t(s, dir, "embeddings"), "embedding", "label")

  val q224Sql: String =
    s"""WITH ${CentroidPredOracle.base}
       |SELECT a.cl AS group_a, b.cl AS group_b,
       |  CAST(floor(list_sum(list_transform(list_zip(a.c, b.c),
       |    x -> (x[1] - x[2]) * (x[1] - x[2]))) * 1000000.0 + 0.5)
       |    AS BIGINT) AS mmd2_micro
       |FROM cents a JOIN cents b ON a.cl < b.cl
       |ORDER BY group_a, group_b""".stripMargin

  // --------------------------------------------------------------------
  // q225 — per-source Jensen–Shannon drift over global length deciles:
  // bins come from GlobalRank.withNtile (the two-pass global sort — no
  // single-task window), then each source's decile distribution is
  // priced against the REST of the corpus. JSD stays finite on empty
  // bins (PSI blows up) and is bounded by ln 2 ≈ 693147180 nano.
  def q225(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val binned = graft.operators.GlobalRank.withNtile(
      docs, Seq(col("n_chars"), col("doc_id")), tiles = 10, tileCol = "bin")
    graft.ext.Drift.jsDivergenceBinned(binned, "source", "bin")
  }

  val q225Sql: String = {
    val p = "(CAST(ngb AS DOUBLE) / CAST(ng AS DOUBLE))"
    val q = "(CAST(nb - ngb AS DOUBLE) / CAST(n - ng AS DOUBLE))"
    val qGuarded = s"(CASE WHEN n - ng > 0 THEN $q ELSE 0.0 END)"
    s"""WITH b AS (SELECT source,
       |     ntile(10) OVER (ORDER BY n_chars, doc_id) AS bin
       |   FROM documents),
       | cc AS (SELECT source, bin, count(*) AS ngb FROM b GROUP BY 1, 2),
       | bt AS (SELECT bin, count(*) AS nb FROM b GROUP BY 1),
       | gt AS (SELECT source, count(*) AS ng FROM b GROUP BY 1),
       | tot AS (SELECT count(*) AS n FROM b),
       | grid AS (SELECT gt.source, gt.ng, bt.bin, bt.nb, tot.n,
       |            coalesce(cc.ngb, 0) AS ngb
       |          FROM gt CROSS JOIN bt CROSS JOIN tot
       |          LEFT JOIN cc ON cc.source = gt.source AND cc.bin = bt.bin),
       | terms AS (SELECT source, ng, CAST(floor((
       |     CASE WHEN ngb > 0 THEN
       |       0.5 * $p * ln($p / (($p + $qGuarded) / 2.0))
       |     ELSE 0.0 END
       |     +
       |     CASE WHEN nb - ngb > 0 AND n - ng > 0 THEN
       |       0.5 * $q * ln($q / (($p + $q) / 2.0))
       |     ELSE 0.0 END) * 1000000000.0 + 0.5) AS BIGINT) AS t
       |   FROM grid)
       |SELECT source, ng AS n, CAST(sum(t) AS BIGINT) AS jsd_nano
       |FROM terms GROUP BY source, ng
       |ORDER BY source""".stripMargin
  }

  // --------------------------------------------------------------------
  // q226 — quadratically-weighted kappa: the ordinal-agreement read-out
  // (near-miss predictions cost (i−j)², not a flat 1) — entirely
  // integer arithmetic, no float anywhere in the statistic.
  def q226(s: SparkSession, dir: String): DataFrame = {
    val p = graft.ext.Eval.centroidPredictions(
      t(s, dir, "embeddings"), "embedding", "label")
    graft.ext.Eval.weightedKappaPpm(p, "label", "pred")
  }

  val q226Sql: String =
    s"""WITH ${CentroidPredOracle.chain},
       | cells AS (SELECT CAST(label AS BIGINT) AS l,
       |     CAST(pred AS BIGINT) AS pr, count(*) AS nij
       |   FROM pred GROUP BY 1, 2),
       | tot AS (SELECT count(*) AS n FROM pred),
       | wo AS (SELECT CAST(coalesce(sum((l - pr) * (l - pr) * nij), 0)
       |     AS BIGINT) AS wo_sum FROM cells),
       | we AS (SELECT CAST(coalesce(sum(
       |       (a.l - b.pr) * (a.l - b.pr) * a.ri * b.cj), 0)
       |     AS BIGINT) AS we_sum
       |   FROM (SELECT l, sum(nij) AS ri FROM cells GROUP BY 1) a
       |   CROSS JOIN (SELECT pr, sum(nij) AS cj FROM cells GROUP BY 1) b)
       |SELECT n, wo_sum, we_sum,
       |  CAST(CASE WHEN we_sum = 0 THEN 1000000
       |    ELSE 1000000 - (n * wo_sum * 1000000) // we_sum
       |  END AS BIGINT) AS kappa_w_ppm
       |FROM tot CROSS JOIN wo CROSS JOIN we""".stripMargin

  // --------------------------------------------------------------------
  // q227 — multiclass Matthews correlation (Gorodkin R_K): integer
  // numerator/radicands from the confusion marginals, two sqrt + one
  // divide in double at the very end, floored to ppm.
  def q227(s: SparkSession, dir: String): DataFrame = {
    val p = graft.ext.Eval.centroidPredictions(
      t(s, dir, "embeddings"), "embedding", "label")
    graft.ext.Eval.mccPpm(p, "label", "pred")
  }

  val q227Sql: String =
    s"""WITH ${CentroidPredOracle.chain},
       | tot AS (SELECT count(*) AS n,
       |     CAST(sum(CASE WHEN label = pred THEN 1 ELSE 0 END) AS BIGINT)
       |       AS correct
       |   FROM pred),
       | tk AS (SELECT label AS k, count(*) AS t FROM pred GROUP BY 1),
       | pk AS (SELECT pred AS k, count(*) AS q FROM pred GROUP BY 1),
       | cr AS (SELECT CAST(coalesce(sum(t * q), 0) AS BIGINT) AS tp_sum
       |   FROM tk JOIN pk USING (k)),
       | sq AS (SELECT
       |     CAST((SELECT coalesce(sum(t * t), 0) FROM tk) AS BIGINT) AS t2,
       |     CAST((SELECT coalesce(sum(q * q), 0) FROM pk) AS BIGINT) AS p2)
       |SELECT n, correct,
       |  CAST(CASE WHEN (n * n - p2) = 0 OR (n * n - t2) = 0 THEN 0
       |    ELSE CAST(floor(CAST(correct * n - tp_sum AS DOUBLE) /
       |      (sqrt(CAST(n * n - p2 AS DOUBLE)) *
       |       sqrt(CAST(n * n - t2 AS DOUBLE))) * 1000000.0 + 0.5)
       |      AS BIGINT)
       |  END AS BIGINT) AS mcc_ppm
       |FROM tot CROSS JOIN cr CROSS JOIN sq""".stripMargin

  /** Name → query, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q226_weighted_kappa" -> (q226 _),
    "q227_multiclass_mcc" -> (q227 _),
    "q219_per_class_prf1" -> (q219 _),
    "q220_kmeans_label_nmi" -> (q220 _),
    "q221_simplified_silhouette" -> (q221 _),
    "q222_calibration_ece" -> (q222 _),
    "q223_fleiss_kappa" -> (q223 _),
    "q224_group_mean_shift" -> (q224 _),
    "q225_source_js_drift" -> (q225 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q226_weighted_kappa" -> q226Sql,
    "q227_multiclass_mcc" -> q227Sql,
    "q219_per_class_prf1" -> q219Sql,
    "q220_kmeans_label_nmi" -> q220Sql,
    "q221_simplified_silhouette" -> q221Sql,
    "q222_calibration_ece" -> q222Sql,
    "q223_fleiss_kappa" -> q223Sql,
    "q224_group_mean_shift" -> q224Sql,
    "q225_source_js_drift" -> q225Sql
  )
}
