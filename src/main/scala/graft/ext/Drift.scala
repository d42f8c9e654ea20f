package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift / two-sample read-outs: "did this slice of the corpus
  * move away from the rest?" — the QA a training-data pipeline runs
  * when a new crawl snapshot, source, or time window lands.
  *
  * Both operators follow the repo's float discipline: group means are
  * FLOAT-ROUNDED before any distance, log terms are nano-rounded per
  * cell before the exact integer sum, so read-outs are reproducible to
  * the last digit on any engine and any partial-aggregation order.
  */
object Drift {

  /** Pairwise linear-kernel MMD² between group centroids:
    * MMD²_lin(A, B) = ‖μ_A − μ_B‖² — the cheapest two-sample statistic
    * over an embedding column, exact in one aggregation (the quadratic
    * kernel forms need a pair sample; the linear form folds to the
    * means, which is why it's the one that scales). Means are
    * float-rounded per component; the distance accumulates in double
    * left-to-right and is floored to micro units.
    *
    * One shuffle builds the k group means; the pair expansion is k²
    * rows of metadata, never data.
    *
    * @return (group_a, group_b, mmd2_micro) for group_a < group_b
    */
  def groupMeanShift(emb: DataFrame, vecCol: String,
      groupCol: String): DataFrame = {
    val dim = VecOps.vecDim(emb, vecCol)
    val means = emb.groupBy(col(groupCol).cast("int").as("g"))
      .agg(VecOps.meanArray(vecCol, dim).as("mvec"))
    val a = means.select(col("g").as("group_a"), col("mvec").as("va"))
    val b = means.select(col("g").as("group_b"), col("mvec").as("vb"))
    val d2 = aggregate(
      zip_with(col("va"), col("vb"),
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    a.join(b, col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"),
        floor(d2 * 1000000.0 + 0.5).cast("long").as("mmd2_micro"))
      .orderBy(col("group_a"), col("group_b"))
  }

  /** Jensen–Shannon divergence of each group's bin distribution against
    * the REST of the corpus (leave-one-group-out), in exact nano
    * integers. JSD is the drift metric that stays finite when a bin is
    * empty on one side (PSI's log-ratio blows up), bounded by ln 2 —
    * a group reading near 693147180 nano occupies bins nobody else
    * touches.
    *
    * Input is an already-binned frame (e.g. [[graft.operators
    * .GlobalRank.withNtile]] deciles over a quality score or length).
    * Cost: two tiny aggregations on (group, bin) and (bin); the grid
    * arithmetic runs on |groups|·|bins| rows. Per-bin terms
    * 0.5·p·ln(p/m) + 0.5·q·ln(q/m), m = (p+q)/2, are nano-rounded
    * BEFORE the per-group integer sum (the [[Eval.nmiPpm]] discipline).
    *
    * @return one row per group: (groupCol, n, jsd_nano)
    */
  def jsDivergenceBinned(binned: DataFrame, groupCol: String,
      binCol: String): DataFrame =
    jsDivergenceFromCounts(toCells(binned, groupCol, binCol),
      "__g", "__b", "ngb", groupCol)

  /** THE row-level fold to mergeable cells — exists once so the three
    * drift read-outs (and the streaming monitor's batch projection)
    * can never disagree about what a cell is: an edit to the bin
    * policy lands on every entry point or none. */
  private def toCells(binned: DataFrame, groupCol: String,
      binCol: String): DataFrame =
    binned.select(col(groupCol).as("__g"),
        col(binCol).cast("int").as("__b"))
      .groupBy(col("__g"), col("__b"))
      .agg(count(lit(1)).as("ngb"))

  /** [[jsDivergenceBinned]] from an already-folded (group, bin, count)
    * frame — the per-cell counts are the MERGEABLE sufficient
    * statistic (≤ |groups|·|bins| rows forever, merged by addition),
    * which is what lets [[graft.streaming.StreamEval]] maintain the
    * drift read-out incrementally over a stream: the batch entry
    * point above and the streaming monitor both delegate HERE, so
    * stream-built ≡ batch-built to the last nano digit because the
    * grid arithmetic exists once. Every total (per group, per bin,
    * overall) folds from the cells; a (group, bin) pair the group
    * never hit reads 0 through the left join exactly as in the
    * row-level form. */
  def jsDivergenceFromCounts(cellCounts: DataFrame, gCol: String,
      bCol: String, nCol: String, outGroupCol: String): DataFrame = {
    val grid = looGrid(cellCounts, gCol, bCol, nCol)
    val pC = col("ngb").cast("double") / col("ng").cast("double")
    val qC = when(col("n") - col("ng") > 0,
      (col("nb") - col("ngb")).cast("double") /
        (col("n") - col("ng")).cast("double")).otherwise(lit(0.0))
    val mC = (pC + qC) / lit(2.0)
    val term =
      when(col("ngb") > 0, lit(0.5) * pC * log(pC / mC)).otherwise(lit(0.0)) +
      when(col("nb") - col("ngb") > 0 && col("n") - col("ng") > 0,
        lit(0.5) * qC * log(qC / mC)).otherwise(lit(0.0))
    grid.select(col("__g"), col("ng"),
        floor(term * 1000000000.0 + 0.5).cast("long").as("t"))
      .groupBy(col("__g"))
      .agg(max(col("ng")).as("n"), sum(col("t")).as("jsd_nano"))
      .select(col("__g").as(outGroupCol), col("n"), col("jsd_nano"))
      .orderBy(col(outGroupCol))
  }

  /** The shared leave-one-group-out grid: every (group, bin) cell
    * with its zero-filled count, bin total, group total and corpus
    * total — the frame [[jsDivergenceFromCounts]],
    * [[ksFromCounts]] and [[psiFromCounts]] all read, built ONCE so
    * the three drift read-outs can never disagree about what a cell
    * is. |groups|·|bins| rows — metadata, not data. */
  private def looGrid(cellCounts: DataFrame, gCol: String, bCol: String,
      nCol: String): DataFrame = {
    val cells = cellCounts.select(col(gCol).as("__g"),
      col(bCol).cast("int").as("__b"), col(nCol).cast("long").as("ngb"))
    val binTotals = cells.groupBy(col("__b")).agg(sum(col("ngb")).as("nb"))
    val groupTotals = cells.groupBy(col("__g")).agg(sum(col("ngb")).as("ng"))
    val nTot = cells.agg(sum(col("ngb")).as("n"))
    groupTotals.crossJoin(binTotals).crossJoin(nTot)
      .join(cells, Seq("__g", "__b"), "left")
      .withColumn("ngb", coalesce(col("ngb"), lit(0L)))
  }

  /** Exact binned two-sample KS of each group vs the REST of the
    * corpus, from the mergeable (group, bin, count) cells — the
    * integer-exact drift read-out beside [[jsDivergenceFromCounts]]:
    * where JSD prices the whole distribution in nats, binned KS reads
    * the single worst CDF point in ppm, with NO floats anywhere
    * (D·ng·(n−ng) is an integer; the one division is integer ppm).
    * Bins must be ordinal (they are: ntile deciles). The cumulative
    * window runs on the |groups|·|bins| grid partitioned by group —
    * metadata, not data. A group that IS the whole corpus has no rest
    * to drift from and reads 0.
    *
    * @return one row per group: (outGroupCol, n, ks_ppm)
    */
  def ksFromCounts(cellCounts: DataFrame, gCol: String, bCol: String,
      nCol: String, outGroupCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__b"))
    looGrid(cellCounts, gCol, bCol, nCol)
      .withColumn("cg", sum(col("ngb")).over(w))
      .withColumn("cr", sum(col("nb") - col("ngb")).over(w))
      .select(col("__g"), col("ng"), col("n"),
        abs(Exact.dec(col("cg")) * (col("n") - col("ng")) -
          Exact.dec(col("cr")) * col("ng")).as("dn"))
      .groupBy(col("__g"))
      .agg(max(col("ng")).as("ng"), max(col("n")).as("nn"),
        max(col("dn")).as("d"))
      .select(col("__g").as(outGroupCol), col("ng").as("n"),
        expr(s"CASE WHEN nn - ng <= 0 THEN 0L ELSE CAST((d * 1000000)" +
          s" div (CAST(ng AS ${Exact.Dec}) * (nn - ng)) AS BIGINT) END")
          .as("ks_ppm"))
      .orderBy(col(outGroupCol))
  }

  /** Population stability index of each group vs the REST, from the
    * same mergeable cells — the industry-dashboard drift number. PSI's
    * log-ratio is infinite on a bin one side never hits, so the
    * counts are Laplace-smoothed (+1 per cell on BOTH sides, i.e.
    * p = (ngb+1)/(ng+B) with B the bin count) — the standard finite
    * PSI, documented rather than silently clamped. Per-cell terms
    * (p−q)·ln(p/q) are nano-rounded BEFORE the per-group integer sum
    * (the [[jsDivergenceFromCounts]] discipline); the double
    * arithmetic is one expression mirrored in the oracle.
    *
    * @return one row per group: (outGroupCol, n, psi_nano)
    */
  def psiFromCounts(cellCounts: DataFrame, gCol: String, bCol: String,
      nCol: String, outGroupCol: String): DataFrame = {
    val grid = looGrid(cellCounts, gCol, bCol, nCol)
      .crossJoin(cellCounts.select(col(bCol)).distinct()
        .agg(count(lit(1)).as("nbins")))
    val pC = (col("ngb") + 1).cast("double") /
      (col("ng") + col("nbins")).cast("double")
    val qC = (col("nb") - col("ngb") + 1).cast("double") /
      (col("n") - col("ng") + col("nbins")).cast("double")
    val term = when(col("n") - col("ng") > 0,
      (pC - qC) * log(pC / qC)).otherwise(lit(0.0))
    grid.select(col("__g"), col("ng"),
        floor(term * 1000000000.0 + 0.5).cast("long").as("t"))
      .groupBy(col("__g"))
      .agg(max(col("ng")).as("n"), sum(col("t")).as("psi_nano"))
      .select(col("__g").as(outGroupCol), col("n"), col("psi_nano"))
      .orderBy(col(outGroupCol))
  }

  /** [[ksFromCounts]] over row-level binned data — one fold to cells,
    * then the shared counts form (same delegation contract as
    * [[jsDivergenceBinned]], so stream-built state and batch rows
    * read identically). */
  def ksBinned(binned: DataFrame, groupCol: String, binCol: String)
      : DataFrame =
    ksFromCounts(toCells(binned, groupCol, binCol),
      "__g", "__b", "ngb", groupCol)

  /** [[psiFromCounts]] over row-level binned data. */
  def psiBinned(binned: DataFrame, groupCol: String, binCol: String)
      : DataFrame =
    psiFromCounts(toCells(binned, groupCol, binCol),
      "__g", "__b", "ngb", groupCol)
}
