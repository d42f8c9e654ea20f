package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.GlobalRank

/** Two-sample / association test folds for corpus curation read-outs
  * (the q252+ shelf): exact-integer statistics over distribution
  * comparisons — "did source X's length distribution move", "are the
  * length deciles homogeneous across sources", "is length really
  * associated with token count" — the questions a curation team asks
  * BEFORE believing a drift dashboard.
  *
  * Design rules shared with [[Eval]] / [[Drift]] / [[Exact]]:
  *  - every rank is the two-pass [[GlobalRank]] (never a single-task
  *    window over the corpus);
  *  - every cross-row sum runs on the DECIMAL(38,0) carrier
  *    ([[Exact.decSum]]) so partial-agg order cannot move a digit and
  *    64-bit accumulators cannot wrap;
  *  - doubles appear only in ONE final expression per statistic,
  *    written with literally the same operation order as the DuckDB
  *    oracle, on exact integer operands;
  *  - "randomness" is a shared integer LCG both engines replay
  *    literally (no engine hash, no float draw);
  *  - incomplete inputs fail LOUDLY (raise_error), never silently
  *    skew the statistic.
  */
object Stats {

  /** Loud 0/1 group guard — the [[Eval]] NULL discipline: a NULL or
    * out-of-domain group label raises with the operator's name rather
    * than silently landing in either sample. */
  private[graft] def groupBit(g: Column, what: String): Column =
    when(g.isNull || (g =!= 0 && g =!= 1),
      raise_error(lit(s"$what: group column must be 0 or 1 and non-null"))
        .cast("int"))
      .otherwise(g.cast("int"))

  /** Shared two-sample CDF frame: one row per DISTINCT value with the
    * per-value counts (a, t), inclusive prefix sums as the integer
    * CDF numerators fa = A(v)·n₂ − B(v)·n₁-style pieces, plus n1/n2
    * riding along — the base every two-sample distribution statistic
    * (KS max, Cramér–von Mises sum, Wasserstein-1 integral) folds
    * from. The prefix sums run over the value HISTOGRAM (bounded by
    * the distinct-value count, never the row count) via
    * [[GlobalRank.withPrefixSum]]; the global rank rides along so
    * integral-style consumers can self-join adjacent values by rank
    * (a shuffle join on rank — no single-task window anywhere).
    *
    * Columns: v, t (rows at v), rk (1-based value rank),
    * ia/ib (inclusive counts ≤ v per group), n1, n2.
    */
  private def twoSampleCdf(df: DataFrame, valueCol: String,
      grpCol: String, what: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val g = df.select(col(valueCol).cast("long").as("v"),
      groupBit(col(grpCol), what).as("g"))
    cdfFromPer(g.groupBy($"v")
      .agg(sum(when($"g" === 1, 1L).otherwise(0L)).as("a"),
        count(lit(1)).as("t")))
  }

  /** The SAME CDF frame from pre-folded per-(value, group) COUNT cells
    * (v, g ∈ {0,1}, n) — the mergeable sufficient statistic a
    * streaming monitor persists ([[graft.streaming.StreamEval]]):
    * per-(group, value) counts merge by ADDITION, so stream-built ≡
    * batch-built holds at the fold, before any statistic is read. */
  private def twoSampleCdfFromCounts(cells: DataFrame, valueCol: String,
      grpCol: String, cntCol: String, what: String): DataFrame = {
    val s = cells.sparkSession
    import s.implicits._
    val c = cells.select(col(valueCol).cast("long").as("v"),
      groupBit(col(grpCol), what).as("g"),
      col(cntCol).cast("long").as("n"))
    cdfFromPer(c.groupBy($"v")
      .agg(sum(when($"g" === 1, $"n").otherwise(0L)).as("a"),
        sum($"n").as("t")))
  }

  /** Shared tail of both CDF builders: per = (v, a, t), pinned once
    * (localCheckpoint — a bounded value histogram): it feeds the rank
    * pass AND the n1/n2 totals, and without the pin the corpus
    * aggregation that built it ran once per consumer. */
  private def cdfFromPer(perIn: DataFrame): DataFrame = {
    val per = perIn.localCheckpoint()
    val s = per.sparkSession
    import s.implicits._
    val cum = GlobalRank.withRankAndPrefixSum(
      GlobalRank.withPrefixSum(per, Seq($"v"), "a", "ca"),
      Seq($"v"), valueCol = "t", rankCol = "rk", sumCol = "ct")
    val tot = per.agg(sum($"a").as("n1"), sum($"t").as("n"))
      .select($"n1", ($"n" - $"n1").as("n2"))
    cum.crossJoin(tot)
      .select($"v", $"t", $"rk",
        ($"ca" + $"a").as("ia"),
        ($"ct" + $"t" - $"ca" - $"a").as("ib"),
        $"n1", $"n2")
  }

  /** Two-sample Kolmogorov–Smirnov distance, exact.
    *
    * D = max over values v of |F̂₁(v) − F̂₂(v)| is computed WITHOUT
    * floats: the statistic is the max of the integer
    * |A·n₂ − B·n₁| over the [[twoSampleCdf]] histogram frame, in
    * units of 1/(n₁n₂) — one map-side-combinable aggregation.
    *
    * Output: n1, n2, d_num (= D·n₁n₂, exact, loud if > 2⁶³),
    * ks_ppm (= ⌊D·10⁶⌋, always in range).
    */
  def ksTwoSample(df: DataFrame, valueCol: String, grpCol: String)
      : DataFrame =
    ksFold(twoSampleCdf(df, valueCol, grpCol, "ksTwoSample"))

  /** [[ksTwoSample]] from pre-folded (value, group, count) cells —
    * LITERALLY the same fold over the counts-built CDF frame, so a
    * streaming monitor's persisted per-(group, value) counts read the
    * identical statistic the batch operator computes. */
  def ksTwoSampleFromCounts(cells: DataFrame, valueCol: String,
      grpCol: String, cntCol: String): DataFrame =
    ksFold(twoSampleCdfFromCounts(cells, valueCol, grpCol, cntCol,
      "ksTwoSampleFromCounts"))

  private def ksFold(cdf: DataFrame): DataFrame = {
    val s = cdf.sparkSession
    import s.implicits._
    cdf
      .select($"n1", $"n2",
        abs(Exact.dec($"ia") * $"n2" - Exact.dec($"ib") * $"n1").as("dn"))
      .groupBy($"n1", $"n2").agg(max($"dn").as("d_num"))
      .select($"n1", $"n2",
        Exact.asLongOrFail($"d_num", "ksTwoSample d_num").as("d_num"),
        expr(s"CAST((d_num * 1000000) div (CAST(n1 AS ${Exact.Dec}) * n2)" +
          " AS BIGINT)").as("ks_ppm"))
  }

  /** Two-sample Cramér–von Mises criterion
    * T = (n₁n₂/N²)·Σ over all N pooled points of (F̂₁ − F̂₂)² — the
    * whole-CDF complement to KS's single worst point. Each distinct
    * value contributes t·D_v² where D_v is the ppm-floored CDF gap
    * (deterministic integer division in both engines, truncation
    * ≤ 1 ppm per point); the weighted sum runs exact on the DECIMAL
    * carrier (≤ n·10¹² — exact past 10²⁵ rows), and the closing
    * n₁n₂/N² scaling divides the sum down by 10⁶ FIRST so the
    * decimal product stays ≤ n³·10⁶ (exact to n ≈ 3·10¹⁰, the chi2
    * family bound; truncation ≤ 1 micro). Same bounded histogram
    * shape as [[ksTwoSample]].
    *
    * Output: n1, n2, t_micro (= ⌊T·10⁶⌋).
    */
  def cvmTwoSample(df: DataFrame, valueCol: String, grpCol: String)
      : DataFrame =
    cvmFold(twoSampleCdf(df, valueCol, grpCol, "cvmTwoSample"))

  /** [[cvmTwoSample]] from pre-folded (value, group, count) cells —
    * the [[ksTwoSampleFromCounts]] delegation contract. */
  def cvmTwoSampleFromCounts(cells: DataFrame, valueCol: String,
      grpCol: String, cntCol: String): DataFrame =
    cvmFold(twoSampleCdfFromCounts(cells, valueCol, grpCol, cntCol,
      "cvmTwoSampleFromCounts"))

  private def cvmFold(cdf: DataFrame): DataFrame = {
    val s = cdf.sparkSession
    import s.implicits._
    cdf
      .select($"n1", $"n2",
        expr(s"abs(CAST(ia AS ${Exact.Dec}) * n2" +
          s" - CAST(ib AS ${Exact.Dec}) * n1) * 1000000" +
          s" div (CAST(n1 AS ${Exact.Dec}) * n2)").as("dppm"),
        $"t")
      .groupBy($"n1", $"n2")
      .agg(Exact.decSum(Exact.dec($"t") * $"dppm" * $"dppm").as("sq"))
      .select($"n1", $"n2",
        expr(s"CAST(CAST(n1 AS ${Exact.Dec}) * n2 * (sq div 1000000)" +
          s" div (CAST(n1 + n2 AS ${Exact.Dec}) * (n1 + n2))" +
          " AS BIGINT)").as("t_micro"))
  }

  /** Exact Wasserstein-1 (earth mover) distance between the two
    * empirical distributions: W₁ = ∫|F̂₁ − F̂₂| dv, the
    * transport-cost read-out in the VALUE's own units. The integral
    * is the rank self-join of the [[twoSampleCdf]] histogram — each
    * value's |A·n₂ − B·n₁| weighted by the gap to the NEXT distinct
    * value (a shuffle join on rank, never a single-task lead window)
    * — summed exact on the DECIMAL carrier and closed by one integer
    * division.
    *
    * Output: n1, n2, w1_micro (= ⌊W₁·10⁶⌋, value units).
    */
  def wasserstein1(df: DataFrame, valueCol: String, grpCol: String)
      : DataFrame =
    w1Fold(twoSampleCdf(df, valueCol, grpCol, "wasserstein1"))

  /** [[wasserstein1]] from pre-folded (value, group, count) cells —
    * the [[ksTwoSampleFromCounts]] delegation contract. */
  def wasserstein1FromCounts(cells: DataFrame, valueCol: String,
      grpCol: String, cntCol: String): DataFrame =
    w1Fold(twoSampleCdfFromCounts(cells, valueCol, grpCol, cntCol,
      "wasserstein1FromCounts"))

  private def w1Fold(cdf: DataFrame): DataFrame = {
    val s = cdf.sparkSession
    import s.implicits._
    val nxt = cdf.select(($"rk" - 1).as("rk"), $"v".as("v_next"))
    // decSum's empty-sum-is-0 keeps the single-distinct-value corpus
    // (no adjacent pair at all) at W1 = 0 rather than zero rows
    val w = cdf.join(nxt, "rk")
      .select((abs(Exact.dec($"ia") * $"n2" - Exact.dec($"ib") * $"n1") *
        ($"v_next" - $"v")).as("seg"))
      .agg(Exact.decSum($"seg").as("w"))
    cdf.agg(first($"n1").as("n1"), first($"n2").as("n2"))
      .crossJoin(w)
      .select($"n1", $"n2",
        expr(s"CAST((w * 1000000) div (CAST(n1 AS ${Exact.Dec}) * n2)" +
          " AS BIGINT)").as("w1_micro"))
  }

  /** Mann–Whitney U with tie-corrected normal approximation, exact
    * until the single final z expression.
    *
    * Pooled average ranks use the q244 double-rank device made
    * JOIN-FREE: the per-value double rank (min + max of the row
    * ranks sharing a value = TWICE the average rank) is a pure
    * function of the value histogram's prefix sums —
    * dr_v = 2·C(<v) + t_v + 1 — so Σ_{g=1} dr = Σ_v a_v·dr_v folds
    * from the SAME histogram row that carries a_v. The corpus is
    * touched exactly once (the map-side-combinable (value → a, t)
    * fold); everything after runs on the bounded histogram, and the
    * r15 hazard — a per-value frame broadcast (driver OOM when
    * distinct ≈ rows) or shuffled (hot-value straggler) back onto
    * the corpus — is structurally GONE: there is no join. Then
    *   2U₁ = Σ_{g=1} dr − n₁(n₁+1),   E[2U₁] = n₁n₂,
    *   Var(U) = n₁n₂·((n+1)·n·(n−1) − Σ(t³−t)) / (12·n·(n−1)),
    * and z = (2U₁ − n₁n₂) / (2·√Var) — the variance pieces stay on
    * the DECIMAL carrier (n³ magnitude: exact past 10¹² rows) and the
    * one double expression is written identically in the oracle.
    *
    * Output: n1, n2, u1_x2 (= 2U₁ exact, loud if > 2⁶³),
    * cliffs_delta_ppm (the distribution-free effect size
    * δ = (#(x>y) − #(x<y))/(n₁n₂) = (2U₁ − n₁n₂)/(n₁n₂), exact ppm
    * with sign-symmetric truncation so both engines round identically
    * on negative values), and z_ppm (0 when the variance is 0 — all
    * values tied).
    */
  def mannWhitneyZ(df: DataFrame, valueCol: String, grpCol: String)
      : DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val g = df.select(col(valueCol).cast("long").as("v"),
      groupBit(col(grpCol), "mannWhitneyZ").as("g"))
    mwuFold(g.groupBy($"v")
      .agg(sum(when($"g" === 1, 1L).otherwise(0L)).as("a"),
        count(lit(1)).as("t")))
  }

  /** [[mannWhitneyZ]] from pre-folded (value, group, count) cells —
    * the [[ksTwoSampleFromCounts]] delegation contract: the streaming
    * monitor's per-(group, value) counts state reads the identical
    * statistic (and Cliff's δ effect size) the batch operator
    * computes. */
  def mannWhitneyZFromCounts(cells: DataFrame, valueCol: String,
      grpCol: String, cntCol: String): DataFrame = {
    val s = cells.sparkSession
    import s.implicits._
    val c = cells.select(col(valueCol).cast("long").as("v"),
      groupBit(col(grpCol), "mannWhitneyZFromCounts").as("g"),
      col(cntCol).cast("long").as("n"))
    mwuFold(c.groupBy($"v")
      .agg(sum(when($"g" === 1, $"n").otherwise(0L)).as("a"),
        sum($"n").as("t")))
  }

  /** Shared MWU fold over the (v, a, t) value histogram: one prefix
    * pass gives dr = 2·C(<v) + t + 1, then ONE aggregation closes
    * every quantity (n, n₁, Σ a·dr, tie correction). */
  private def mwuFold(per: DataFrame): DataFrame = {
    val s = per.sparkSession
    import s.implicits._
    GlobalRank.withPrefixSum(per, Seq($"v"), "t", "ct")
      .agg(coalesce(sum($"t"), lit(0L)).as("n"),
        coalesce(sum($"a"), lit(0L)).as("n1"),
        Exact.decSum(Exact.dec($"a") * ($"ct" * 2 + $"t" + 1))
          .as("sdr1"),
        Exact.decSum(Exact.dec($"t") * $"t" * $"t" - $"t").as("tie3"))
      .select($"n", $"n1", ($"n" - $"n1").as("n2"), $"sdr1", $"tie3")
      .select($"n", $"n1", $"n2",
        expr(s"sdr1 - CAST(n1 AS ${Exact.Dec}) * (n1 + 1)").as("u1_x2"),
        expr(s"CAST(n + 1 AS ${Exact.Dec}) * n * (n - 1) - tie3").as("d3"))
      .select($"n1", $"n2",
        Exact.asLongOrFail($"u1_x2", "mannWhitneyZ u1_x2").as("u1_x2"),
        expr(s"CASE WHEN n1 = 0 OR n2 = 0 THEN 0L" +
          s" WHEN u1_x2 < CAST(n1 AS ${Exact.Dec}) * n2 THEN" +
          s" -CAST(((CAST(n1 AS ${Exact.Dec}) * n2 - u1_x2) * 1000000)" +
          s" div (CAST(n1 AS ${Exact.Dec}) * n2) AS BIGINT)" +
          s" ELSE CAST(((u1_x2 - CAST(n1 AS ${Exact.Dec}) * n2)" +
          s" * 1000000) div (CAST(n1 AS ${Exact.Dec}) * n2) AS BIGINT)" +
          " END").as("cliffs_delta_ppm"),
        expr(s"CASE WHEN d3 <= 0 OR n1 = 0 OR n2 = 0 THEN 0L ELSE " +
          s"CAST(floor(CAST(u1_x2 - CAST(n1 AS ${Exact.Dec}) * n2" +
          " AS DOUBLE) / (2.0 * sqrt(CAST(n1 AS DOUBLE) * n2" +
          " * CAST(d3 AS DOUBLE)" +
          " / (12.0 * CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))" +
          " * 1000000.0 + 0.5) AS BIGINT) END").as("z_ppm"))
  }

  /** Spearman rank correlation between two integer columns, exact ppm
    * (ties get AVERAGE ranks; Pearson on double-ranks equals Pearson
    * on average ranks — the scaling by 2 cancels).
    *
    * JOIN-FREE corpus contract, the [[mannWhitneyZ]] device twice:
    * ONE fold to the (x, y) PAIR histogram (map-side combinable),
    * then each axis's double rank is a pure function of that
    * histogram's own marginal prefix sums (dr = 2·C(<v) + t + 1) and
    * every join is histogram × histogram (≤ distinct-pair rows, never
    * a corpus row; per-key fan-out bounded by the other axis's domain
    * — no hot-row skew). All sums DECIMAL (Σ c·drx·dry is
    * n³-magnitude); the single final ratio runs in double on exact
    * operands with floor(·1e6 + 0.5).
    *
    * Output: n, spearman_ppm.
    */
  def spearmanRho(df: DataFrame, xCol: String, yCol: String)
      : DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val g = df.select(
      spearmanAxis(col(xCol), "spearmanRho", xCol).as("x"),
      spearmanAxis(col(yCol), "spearmanRho", yCol).as("y"))
    spearmanFold(g.groupBy($"x", $"y").agg(count(lit(1)).as("c")))
  }

  /** Loud NULL guard for a Spearman axis — the shelf's discipline
    * (groupBit/chi² raise on NULL): a NULL x or y would otherwise
    * silently vanish in the marginal joins, shrinking n with no
    * signal. Callers with legitimately missing pairs filter BEFORE
    * calling, so the drop is visible in their plan, not ours. */
  private def spearmanAxis(c: Column, op: String, name: String): Column =
    when(c.isNull,
      raise_error(lit(s"$op: NULL in '$name' — Spearman is defined " +
        "over complete pairs; filter missing rows explicitly before " +
        "calling")).cast("long"))
      .otherwise(c.cast("long"))

  /** [[spearmanRho]] from pre-folded (x, y, count) cells — the
    * [[ksTwoSampleFromCounts]] delegation contract. */
  def spearmanRhoFromCounts(cells: DataFrame, xCol: String,
      yCol: String, cntCol: String): DataFrame = {
    val s = cells.sparkSession
    import s.implicits._
    val c = cells.select(
      spearmanAxis(col(xCol), "spearmanRhoFromCounts", xCol).as("x"),
      spearmanAxis(col(yCol), "spearmanRhoFromCounts", yCol).as("y"),
      col(cntCol).cast("long").as("n"))
    spearmanFold(c.groupBy($"x", $"y").agg(sum($"n").as("c")))
  }

  /** Shared Spearman fold over the pinned (x, y, c) pair histogram:
    * marginal prefix passes give each axis's double rank, one
    * aggregation closes every moment. */
  private def spearmanFold(cellsIn: DataFrame): DataFrame = {
    val cells = cellsIn.localCheckpoint()
    val s = cells.sparkSession
    import s.implicits._
    def drFrame(k: String, out: String): DataFrame = {
      val per = cells.groupBy(col(k)).agg(sum($"c").as("t"))
      GlobalRank.withPrefixSum(per, Seq(col(k)), "t", "ct")
        .select(col(k), ($"ct" * 2 + $"t" + 1).as(out))
    }
    cells
      .join(drFrame("x", "drx"), "x")
      .join(drFrame("y", "dry"), "y")
      .agg(coalesce(sum($"c"), lit(0L)).as("n"),
        Exact.decSum(Exact.dec($"c") * $"drx").as("sx"),
        Exact.decSum(Exact.dec($"c") * $"dry").as("sy"),
        Exact.decSum(Exact.dec($"c") * $"drx" * $"drx").as("sxx"),
        Exact.decSum(Exact.dec($"c") * $"dry" * $"dry").as("syy"),
        Exact.decSum(Exact.dec($"c") * $"drx" * $"dry").as("sxy"))
      .select($"n",
        expr(s"CAST(n AS ${Exact.Dec}) * sxy - sx * sy").as("num"),
        expr(s"CAST(n AS ${Exact.Dec}) * sxx - sx * sx").as("radx"),
        expr(s"CAST(n AS ${Exact.Dec}) * syy - sy * sy").as("rady"))
      .select($"n",
        expr("CASE WHEN radx = 0 OR rady = 0 THEN 0 ELSE" +
          " CAST(floor(CAST(num AS DOUBLE) /" +
          " (sqrt(CAST(radx AS DOUBLE)) * sqrt(CAST(rady AS DOUBLE)))" +
          " * 1000000.0 + 0.5) AS BIGINT) END").as("spearman_ppm"))
  }

  /** Pearson chi-square homogeneity over a bounded (bin × group)
    * contingency, plus Cramér's V.
    *
    * One shuffle builds the cell counts; row/column marginals are
    * re-aggregations of the CELL frame (bounded by bins·groups, never
    * the corpus) and are BROADCAST back. Exactness: the algebraic
    * form χ² = Σ O²·n/(r·c) − n is computed with per-cell
    * micro-floored integer division (deterministic in both engines),
    * then one exact DECIMAL sum — per-cell truncation bounds the
    * error at #cells micro, and partial-agg order cannot move a
    * digit. Magnitude bound: O²·n·10⁶ ≤ n³·10⁶ must fit
    * DECIMAL(38,0) → exact to n ≈ 3·10¹⁰ rows (loud past it).
    *
    * Output: n, n_bins, n_groups, dof, chi2_micro (clamped at ≥ 0:
    * truncation can leave −#cells micro at χ² = 0), cramers_v_ppm.
    */
  def chiSquareHomogeneity(df: DataFrame, binCol: String, grpCol: String)
      : DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val base = df.select(
      when(col(binCol).isNull,
        raise_error(lit("chiSquareHomogeneity: NULL in bin column"))
          .cast("string"))
        .otherwise(col(binCol).cast("string")).as("bin"),
      when(col(grpCol).isNull,
        raise_error(lit("chiSquareHomogeneity: NULL in group column"))
          .cast("string"))
        .otherwise(col(grpCol).cast("string")).as("grp"))
    chi2Fold(base.groupBy($"bin", $"grp").agg(count(lit(1)).as("o")))
  }

  /** [[chiSquareHomogeneity]] from pre-folded (bin, group, count)
    * cells — the [[ksTwoSampleFromCounts]] delegation contract: the
    * binned drift monitor state reads the identical test. */
  def chiSquareFromCounts(cells: DataFrame, binCol: String,
      grpCol: String, cntCol: String): DataFrame = {
    val s = cells.sparkSession
    import s.implicits._
    val c = cells.select(
      when(col(binCol).isNull,
        raise_error(lit("chiSquareFromCounts: NULL in bin column"))
          .cast("string"))
        .otherwise(col(binCol).cast("string")).as("bin"),
      when(col(grpCol).isNull,
        raise_error(lit("chiSquareFromCounts: NULL in group column"))
          .cast("string"))
        .otherwise(col(grpCol).cast("string")).as("grp"),
      col(cntCol).cast("long").as("n"))
    chi2Fold(c.groupBy($"bin", $"grp").agg(sum($"n").as("o")))
  }

  /** Shared chi-square fold over the (bin, grp, o) cell frame. */
  private def chi2Fold(cellsIn: DataFrame): DataFrame = {
    val s = cellsIn.sparkSession
    import s.implicits._
    // pinned once (bounded: bins × groups): the cell frame feeds the
    // row/column marginals, the totals AND the main join — without
    // the pin the corpus aggregation that built it ran 4×
    val cells = cellsIn.localCheckpoint()
    val rows = cells.groupBy($"bin").agg(sum($"o").as("r"))
    val cols = cells.groupBy($"grp").agg(sum($"o").as("c"))
    val tot = cells.agg(sum($"o").as("n"),
      countDistinct($"bin").as("n_bins"),
      countDistinct($"grp").as("n_groups"))
    cells
      .join(broadcast(rows), "bin")
      .join(broadcast(cols), "grp")
      .crossJoin(broadcast(tot))
      .select($"n", $"n_bins", $"n_groups",
        expr(s"(CAST(o AS ${Exact.Dec}) * o * n * 1000000)" +
          s" div (CAST(r AS ${Exact.Dec}) * c)").as("term"))
      .groupBy($"n", $"n_bins", $"n_groups")
      .agg(Exact.decSum($"term").as("st"))
      .select($"n", $"n_bins", $"n_groups",
        (($"n_bins" - 1) * ($"n_groups" - 1)).as("dof"),
        expr(s"greatest(CAST(0 AS ${Exact.Dec})," +
          s" st - CAST(n AS ${Exact.Dec}) * 1000000)").as("chi2"))
      .select($"n", $"n_bins", $"n_groups", $"dof",
        Exact.asLongOrFail($"chi2", "chiSquareHomogeneity chi2_micro")
          .as("chi2_micro"),
        expr("CASE WHEN dof = 0 THEN 0L ELSE" +
          " CAST(floor(sqrt(CAST(chi2 AS DOUBLE) / 1000000.0" +
          " / (CAST(n AS DOUBLE)" +
          " * least(n_bins - 1, n_groups - 1)))" +
          " * 1000000.0 + 0.5) AS BIGINT) END").as("cramers_v_ppm"))
  }

  /** The shared two-round LCG draw in [0, 2³¹) — a SQL fragment valid
    * in BOTH Spark SQL and DuckDB (only `*`, `+`, `%`), seeded by an
    * integer expression; the seed is reduced mod 2³¹ BEFORE the
    * multiply so the product stays under 2⁶² at any id scale. */
  def lcgU31Sql(seed: String): String = {
    val x0 = s"(($seed) % 2147483648)"
    val x1 = s"((1103515245 * $x0 + 12345) % 2147483648)"
    s"((1103515245 * $x1 + 12345) % 2147483648)"
  }

  /** The LCG fair coin: bit 20 of [[lcgU31Sql]] (low LCG bits
    * alternate), via `%` and a comparison only — no division operator,
    * so the one fragment parses identically in both engines. */
  def lcgBitSql(seed: String): String =
    s"(CASE WHEN (${lcgU31Sql(seed)}) % 2097152 >= 1048576" +
      " THEN 1 ELSE 0 END)"

  /** Randomization test for a difference in mean value between two
    * labeled groups: B deterministic LCG coin-flip re-labelings, each
    * replicate's |mean difference| folded in the SAME scan (each row
    * carries its B pseudo-labels — no resampling shuffle exists), and
    * the p-value is the add-one share of replicates at least as
    * extreme as the observed labeling. Means are nano-floored exact
    * integer divisions, so "at least as extreme" is an INTEGER
    * comparison both engines replay bit-for-bit. A replicate that
    * flips every row to one side (probability 2·2⁻ⁿ) counts as
    * extreme — conservative, documented. The observed groups must
    * both be non-empty (loud otherwise).
    *
    * Output: n, b_reps, obs_diff_nano, b_ge, p_ppm.
    */
  def permutationMeanDiff(df: DataFrame, valueCol: String, grpCol: String,
      idCol: String, reps: Int): DataFrame = {
    require(reps >= 1, s"reps must be >= 1, got $reps")
    val s = df.sparkSession
    import s.implicits._
    val g = df.select(col(valueCol).cast("long").as("x"),
      col(idCol).cast("long").as("id"),
      groupBit(col(grpCol), "permutationMeanDiff").as("g"))
    val obs = g.agg(count(lit(1)).as("n"),
        sum($"g".cast("long")).as("na"),
        Exact.decSum(when($"g" === 1, $"x").otherwise(0L)).as("sa"),
        Exact.decSum(when($"g" === 0, $"x").otherwise(0L)).as("sb"))
      .select($"n", $"na", ($"n" - $"na").as("nb"), $"sa", $"sb")
      .select($"n",
        when($"na".isNull || $"na" === 0 || $"nb" === 0,
          raise_error(lit("permutationMeanDiff: a group is empty"))
            .cast("long"))
          .otherwise(expr("CAST(abs((sa * 1000000000) div na" +
            " - (sb * 1000000000) div nb) AS BIGINT)"))
          .as("obs_diff_nano"))
    val perRep = g
      .select($"x", $"id", explode(sequence(lit(0L), lit(reps - 1L))).as("b"))
      .select($"x", $"b",
        expr(lcgBitSql(s"id * $reps + b")).cast("int").as("bit"))
      .groupBy($"b")
      .agg(count(lit(1)).as("nr"), sum($"bit".cast("long")).as("nra"),
        Exact.decSum(when($"bit" === 1, $"x").otherwise(0L)).as("sra"),
        Exact.decSum(when($"bit" === 0, $"x").otherwise(0L)).as("srb"))
      .select($"b",
        when($"nra" === 0 || $"nra" === $"nr", lit(null).cast("long"))
          .otherwise(expr("CAST(abs((sra * 1000000000) div nra" +
            " - (srb * 1000000000) div (nr - nra)) AS BIGINT)"))
          .as("diff_nano"))
    perRep.crossJoin(obs)
      .agg(first($"n").as("n"), count(lit(1)).as("b_reps"),
        first($"obs_diff_nano").as("obs_diff_nano"),
        sum(when($"diff_nano".isNull ||
          $"diff_nano" >= $"obs_diff_nano", 1L).otherwise(0L)).as("b_ge"))
      .select($"n", $"b_reps", $"obs_diff_nano", $"b_ge",
        expr("((1 + b_ge) * 1000000) div (b_reps + 1)").as("p_ppm"))
  }

  /** Per-category randomization tests with Benjamini–Hochberg
    * correction — the multiple-testing capstone: "which of these m
    * sources/languages REALLY moved, after accounting for the fact
    * that we ran m tests?".
    *
    * For each category c the observed statistic is the |in-vs-rest
    * mean gap| (nano-floored exact integer division). The null is
    * size-matched binomial re-labeling: replicate b marks each row
    * pseudo-in with probability n_c/n via an integer threshold on the
    * shared [[lcgU31Sql]] draw (seed (id·m + cat_index)·reps + b — one
    * independent stream per (row, test, replicate)), so every
    * replicate statistic folds map-side from the SAME n·m·B exploded
    * scan — no shuffle of data ever happens, and m·B is the bounded
    * fold width. An all-one-side replicate counts as extreme
    * (conservative). p = (1 + #{|diff_b| ≥ obs})/(B+1), exact in ppm.
    *
    * BH then runs on the m-row p frame (metadata — the ORDER BY
    * window there is driver-scale, the q249 carve-out): ascending
    * (p, category) ranks k, k* = max{k : p_(k)·m ≤ α·k} in exact
    * integer arithmetic, reject exactly the tests ranked ≤ k*.
    *
    * Resolution contract: rejections need p ≥ 1/(B+1) to clear
    * α·1/m, i.e. reps ≥ m/α − 1 — loud, not silent, because an
    * undersized B makes EVERY test unrejectable.
    *
    * Output per category: grp, n_g, obs_diff_nano, p_ppm, bh_k,
    * bh_reject (0/1), ordered by grp.
    */
  def bhRandomizationTests(df: DataFrame, valueCol: String,
      grpCol: String, idCol: String, reps: Int, alphaPpm: Long)
      : DataFrame = {
    require(reps >= 1, s"reps must be >= 1, got $reps")
    require(alphaPpm > 0 && alphaPpm < 1000000,
      s"alphaPpm must be in (0, 1e6), got $alphaPpm")
    val s = df.sparkSession
    import s.implicits._
    val g = df.select(col(idCol).cast("long").as("id"),
      col(valueCol).cast("long").as("x"),
      when(col(grpCol).isNull,
        raise_error(lit("bhRandomizationTests: NULL in group column"))
          .cast("string"))
        .otherwise(col(grpCol).cast("string")).as("grp"))
    val tot = g.agg(count(lit(1)).as("n"), Exact.decSum($"x").as("sx"))
    // per-category frame: bounded by m — index, size, threshold, obs
    val perg = g.groupBy($"grp")
      .agg(count(lit(1)).as("ng"), Exact.decSum($"x").as("sg"))
    val m = perg.count()
    require(reps + 1 >= math.ceil(m * 1000000.0 / alphaPpm).toLong,
      s"reps=$reps cannot resolve alpha=${alphaPpm}ppm over $m tests " +
        s"(need reps >= ${math.ceil(m * 1e6 / alphaPpm).toLong - 1}): " +
        "every BH rejection would be impossible by construction")
    val gi = org.apache.spark.sql.expressions.Window.orderBy($"grp")
    val cats = perg.crossJoin(tot)
      .select($"grp", $"ng",
        (row_number().over(gi) - 1)
          .cast("long").as("gidx"), // m-row frame: window is metadata
        expr(s"CAST((CAST(ng AS ${Exact.Dec}) * 2147483648) div n" +
          " AS BIGINT)").as("thr"),
        when($"ng" === $"n",
          raise_error(lit("bhRandomizationTests: a category covers " +
            "every row — no out-group exists")).cast("long"))
          .otherwise(expr("CAST(abs((sg * 1000000000) div ng" +
            " - ((sx - sg) * 1000000000) div (n - ng)) AS BIGINT)"))
          .as("obs_diff_nano"))
    // one scan: every (row, test, replicate) coin folds map-side into
    // the bounded m·B group frame — the data itself never shuffles
    val diffs = g
      .crossJoin(broadcast(
        cats.select($"grp".as("test_grp"), $"gidx", $"thr")))
      .select($"x", $"test_grp", $"thr", $"id", $"gidx",
        explode(sequence(lit(0L), lit(reps - 1L))).as("b"))
      .select($"x", $"test_grp", $"b",
        expr(s"CASE WHEN ${lcgU31Sql(s"(id * $m + gidx) * $reps + b")}" +
          " < thr THEN 1 ELSE 0 END").as("coin"))
      .groupBy($"test_grp", $"b")
      .agg(count(lit(1)).as("nr"), sum($"coin".cast("long")).as("nra"),
        Exact.decSum(when($"coin" === 1, $"x").otherwise(0L)).as("sra"),
        Exact.decSum($"x").as("srt"))
      .select($"test_grp",
        when($"nra" === 0 || $"nra" === $"nr", lit(null).cast("long"))
          .otherwise(expr("CAST(abs((sra * 1000000000) div nra" +
            " - ((srt - sra) * 1000000000) div (nr - nra)) AS BIGINT)"))
          .as("diff_nano"))
    val ps = diffs
      .join(broadcast(cats.select($"grp".as("test_grp"), $"ng",
        $"obs_diff_nano")), "test_grp")
      .groupBy($"test_grp", $"ng", $"obs_diff_nano")
      .agg(sum(when($"diff_nano".isNull ||
        $"diff_nano" >= $"obs_diff_nano", 1L).otherwise(0L)).as("b_ge"))
      .select($"test_grp".as("grp"), $"ng".as("n_g"), $"obs_diff_nano",
        expr(s"((b_ge + 1) * 1000000) div ${reps + 1}").as("p_ppm"))
    // BH on the m-row p frame: metadata-scale windows (q249 carve-out)
    val ki = org.apache.spark.sql.expressions.Window
      .orderBy($"p_ppm", $"grp")
    val flagged = ps
      .withColumn("bh_k", row_number().over(ki).cast("long"))
      .withColumn("ok",
        when($"p_ppm" * m <= lit(alphaPpm) * $"bh_k", $"bh_k"))
    val kstar = flagged.agg(coalesce(max($"ok"), lit(0L)).as("kstar"))
    flagged.crossJoin(broadcast(kstar))
      .select($"grp", $"n_g", $"obs_diff_nano", $"p_ppm", $"bh_k",
        when($"bh_k" <= $"kstar", 1L).otherwise(0L).as("bh_reject"))
      .orderBy($"grp")
  }

  /** Deterministic weighted systematic resampling: m evenly-spaced
    * probes at the midpoints T_j = ⌊(2j+1)·W/(2m)⌋ of the cumulative
    * weight axis (the particle-filter "systematic" scheme — no
    * randomness, exact integers, and by the telescoping of
    * count(x) = #{j : T_j < x} the multiplicities ALWAYS sum to m).
    * One [[GlobalRank.withPrefixSum]] over the deterministic id order
    * gives each row its weight interval [c, c+w); its multiplicity is
    * count(c+w) − count(c), a closed-form integer expression. Weights
    * must be positive (loud otherwise); bound: 2m·W must fit BIGINT
    * (m = 100 → W < 4.6·10¹⁶ total weight — 46 PB of characters).
    *
    * Returns the per-row frame (id, w, mult) — callers aggregate.
    */
  def systematicResample(df: DataFrame, idCol: String, weightCol: String,
      m: Int): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    val s = df.sparkSession
    import s.implicits._
    val g = df.select(col(idCol).cast("long").as("id"),
      when(col(weightCol).isNull || col(weightCol) <= 0,
        raise_error(lit("systematicResample: weights must be > 0"))
          .cast("long"))
        .otherwise(col(weightCol).cast("long")).as("w"))
    val pre = GlobalRank.withPrefixSum(g, Seq($"id"), "w", "c")
    val tot = g.agg(sum($"w").as("tw"))
    def cnt(x: String): String =
      s"CASE WHEN 2 * $m * ($x) <= tw THEN 0L ELSE " +
        s"least(CAST($m AS BIGINT)," +
        s" (2 * $m * ($x) - tw - 1) div (2 * tw) + 1) END"
    pre.crossJoin(tot)
      .select($"id", $"w",
        expr(s"${cnt("c + w")} - ${cnt("c")}").as("mult"))
  }

  /** Vocabulary coverage curve: for each k, the exact share of all
    * token OCCURRENCES covered by the top-k types (count-desc,
    * token-asc deterministic order). One [[GlobalRank]] sort of the
    * TYPE histogram — never the token stream — then each k is a
    * single exact rank selection (clamped to the type count) against
    * the inclusive prefix sum; the k-row lookup side is broadcast.
    *
    * The histogram is pinned once (localCheckpoint — vocabulary-sized,
    * bounded): it feeds BOTH the rank pass and the totals aggregation,
    * and without the pin the caller's histogram build (for q256 a full
    * corpus tokenization — the dominant cost at scale) ran twice.
    *
    * Output: (k, types_used, coverage_ppm), ordered by k.
    */
  def coverageCurve(counts: DataFrame, tokenCol: String, cntCol: String,
      ks: Seq[Long]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1L), s"ks must all be >= 1: $ks")
    val s = counts.sparkSession
    import s.implicits._
    val base = counts.select(col(tokenCol).cast("string").as("tok"),
      col(cntCol).cast("long").as("cnt")).localCheckpoint()
    val ranked = GlobalRank.withRankAndPrefixSum(base,
      Seq($"cnt".desc, $"tok"), valueCol = "cnt",
      rankCol = "rk", sumCol = "cb")
    val tot = base.agg(sum($"cnt").as("tt"), count(lit(1)).as("n_types"))
    val ksdf = ks.toDF("k").crossJoin(tot)
      .select($"k", least($"k", $"n_types").as("keff"), $"tt")
    ranked.join(broadcast(ksdf), $"rk" === $"keff")
      .select($"k", $"keff".as("types_used"),
        expr(s"CAST((CAST(cb + cnt AS ${Exact.Dec}) * 1000000) div tt" +
          " AS BIGINT)").as("coverage_ppm"))
      .orderBy($"k")
  }

  /** Isotonic (pool-adjacent-violators) calibration over BOUNDED
    * confidence bins — the monotone accuracy curve a probability
    * calibrator actually deploys, where the raw reliability table
    * (q222) only diagnoses. Uses the max-min closed form of PAV:
    *   fitted(i) = max_{j ≤ i} min_{k ≥ i} avg(ok over bins j..k)
    * — interval averages come from bin prefix sums, every quantity is
    * an exact micro integer (interval avg = (ok·10⁶) div n, identical
    * truncation in both engines), and the O(B³) pair enumeration runs
    * on the ≤ bins-row frame: metadata, not data (the corpus was
    * folded to per-bin counts by the caller). The window over the
    * bin frame is the q249 bounded-frame carve-out.
    *
    * Output per bin: bin, n, acc_micro (raw), fitted_micro
    * (monotone non-decreasing in bin), ordered by bin. The O(B³)
    * interval enumeration makes the bounded contract structural:
    * the bin frame is pinned once (it feeds the prefix window, both
    * interval sides and the final join) and its bin count must pass
    * `maxBins` (default 1024 — calibration tables are tens of bins),
    * loud otherwise.
    */
  def isotonicCalibration(cells: DataFrame, binCol: String, nCol: String,
      okCol: String, maxBins: Long = 1024L): DataFrame = {
    val s = cells.sparkSession
    import s.implicits._
    val base = cells.select(col(binCol).cast("long").as("bin"),
      col(nCol).cast("long").as("n"), col(okCol).cast("long").as("ok"))
      .localCheckpoint()
    val m = base.count()
    require(m <= maxBins,
      s"isotonicCalibration: $m bins exceed maxBins=$maxBins — the " +
        "O(bins^3) PAV interval frame is a bounded-METADATA " +
        "contract; fold the corpus to per-bin counts first (or raise " +
        "maxBins deliberately)")
    val w = org.apache.spark.sql.expressions.Window.orderBy($"bin")
    val pref = base
      .withColumn("pn", sum($"n").over(w))
      .withColumn("pok", sum($"ok").over(w)) // bounded frame: metadata
    val jSide = pref.select($"bin".as("jbin"),
      ($"pn" - $"n").as("pnj"), ($"pok" - $"ok").as("pokj"))
    val kSide = pref.select($"bin".as("kbin"), $"pn".as("pnk"),
      $"pok".as("pokk"))
    val intervals = jSide.join(kSide, $"jbin" <= $"kbin")
      .select($"jbin", $"kbin",
        expr(s"((CAST(pokk AS ${Exact.Dec}) - pokj) * 1000000)" +
          " div (pnk - pnj)").as("avg_micro"))
    val fitted = base.select($"bin")
      .join(intervals, $"jbin" <= $"bin" && $"bin" <= $"kbin")
      .groupBy($"bin", $"jbin").agg(min($"avg_micro").as("mn"))
      .groupBy($"bin").agg(max($"mn").as("fitted_micro"))
    base.join(fitted, "bin")
      .select($"bin", $"n",
        expr(s"(CAST(ok AS ${Exact.Dec}) * 1000000) div n")
          .as("acc_micro"), $"fitted_micro")
      .orderBy($"bin")
  }

  /** Exact autocorrelation of an aggregated series at lags 1..maxLag.
    *
    * BOUNDED-FRAME contract: the input is an already-aggregated
    * series (one row per period — days, hours), so every window and
    * self-join here runs on metadata (a year is 365 rows), never on
    * the event stream; the caller pays the one corpus aggregation.
    * Exactness: the mean never materializes — multiplying through by
    * n turns (x_t − x̄) into the integer (n·x_t − S), so
    *   r_l = Σ (n·x_t − S)(n·x_{t+l} − S) / Σ (n·x_t − S)²
    * is a ratio of exact DECIMAL sums (the standard estimator:
    * full-series denominator, overlapping-pair numerator), closed by
    * one sign-symmetric integer division to ppm.
    *
    * The contract is STRUCTURAL, not just documented: the series is
    * pinned once (localCheckpoint — it feeds the denominator, the
    * rank pass and every lag join) and its period count must pass
    * `maxPeriods` (default 10⁶), failing LOUDLY instead of silently
    * detonating the window on an unaggregated event stream.
    *
    * Output per lag: lag, n_pairs, acf_ppm — lags with NO pair
    * (series shorter than lag+1) are DROPPED, the grouped-fold
    * reading (an ungrouped agg over an empty join would otherwise
    * fabricate a (0, 0) row no per-lag GROUP BY engine emits).
    */
  def autocorrelation(series: DataFrame, tCol: String, xCol: String,
      maxLag: Int, maxPeriods: Long = 1000000L): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val s = series.sparkSession
    import s.implicits._
    val base = series.select(col(tCol).as("t"),
      col(xCol).cast("long").as("x")).localCheckpoint()
    val m = base.count()
    require(m <= maxPeriods,
      s"autocorrelation: $m periods exceed maxPeriods=$maxPeriods — " +
        "this read-out runs on a bounded AGGREGATED series; " +
        "aggregate the stream to periods first (or raise maxPeriods " +
        "deliberately)")
    val tot = base.agg(count(lit(1)).as("n"), Exact.decSum($"x").as("sx"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"t")
    val ranked = base
      .withColumn("rk", row_number().over(w)) // bounded frame: metadata
      .crossJoin(broadcast(tot))
      .select($"rk", expr(s"CAST(n AS ${Exact.Dec}) * x - sx").as("d"),
        $"n")
    val den = ranked.agg(Exact.decSum($"d" * $"d").as("den"),
      first($"n").as("n"))
    val lagged = ranked.select(($"rk" - lit(1)).as("rk0"), $"d".as("dl"))
    val nums = Seq.range(1, maxLag + 1).map { l =>
      ranked.join(lagged.select(($"rk0" - lit(l - 1)).as("rk"),
          $"dl"), "rk")
        .agg(lit(l).cast("long").as("lag"), count(lit(1)).as("n_pairs"),
          Exact.decSum($"d" * $"dl").as("num"))
    }.reduce(_ unionByName _)
    nums.crossJoin(broadcast(den))
      .filter($"n_pairs" > 0)
      .select($"lag", $"n_pairs",
        expr("CASE WHEN den <= 0 THEN 0L" +
          " WHEN num < 0 THEN -CAST(((-num) * 1000000) div den AS BIGINT)" +
          " ELSE CAST((num * 1000000) div den AS BIGINT) END")
          .as("acf_ppm"))
      .orderBy($"lag")
  }

  /** CUSUM change-point read-out over an aggregated series (same
    * BOUNDED-FRAME contract as [[autocorrelation]]): the period t*
    * maximizing |Σ_{i≤t}(x_i − x̄)| — the classic "where did the mean
    * shift" estimator — with the deviation priced as a ppm share of
    * the series' total mass. Multiplied through by n, the cumulative
    * deviation n·S_t = Σ_{i≤t}(n·x_i − S) stays an exact integer;
    * ties break to the EARLIEST period.
    *
    * Output: n_periods, change_t, dev_ppm (= max|n·S_t|·10⁶ / (n·S),
    * 0 when the series total is 0). The bounded-frame contract is
    * structural: the series is pinned once and its period count must
    * pass `maxPeriods`, loud otherwise (see [[autocorrelation]]).
    */
  def cusumChangePoint(series: DataFrame, tCol: String, xCol: String,
      maxPeriods: Long = 1000000L): DataFrame = {
    val s = series.sparkSession
    import s.implicits._
    val base = series.select(col(tCol).as("t"),
      col(xCol).cast("long").as("x")).localCheckpoint()
    val m = base.count()
    require(m <= maxPeriods,
      s"cusumChangePoint: $m periods exceed maxPeriods=$maxPeriods — " +
        "this read-out runs on a bounded AGGREGATED series; " +
        "aggregate the stream to periods first (or raise maxPeriods " +
        "deliberately)")
    val tot = base.agg(count(lit(1)).as("n"), Exact.decSum($"x").as("sx"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"t")
    base
      .withColumn("rk", row_number().over(w)) // bounded frame: metadata
      .crossJoin(broadcast(tot))
      .withColumn("d", expr(s"CAST(n AS ${Exact.Dec}) * x - sx"))
      .withColumn("cs", sum($"d").over(w))
      .select($"t", $"n", $"sx", abs($"cs").as("dev"))
      .orderBy($"dev".desc, $"t".asc).limit(1)
      .select($"n".as("n_periods"), $"t".as("change_t"),
        expr(s"CASE WHEN sx <= 0 THEN 0L ELSE" +
          s" CAST((dev * 1000000) div (CAST(n AS ${Exact.Dec}) * sx)" +
          " AS BIGINT) END").as("dev_ppm"))
  }

  /** Theil–Sen robust trend over an aggregated series (same
    * BOUNDED-FRAME contract as [[autocorrelation]]): the median of
    * all pairwise slopes (x_j − x_i)/(t_j − t_i), the trend estimator
    * a single outlier day cannot move. Every slope is a
    * sign-symmetrically truncated micro integer (identical in both
    * engines — no float ordering anywhere), the median is an exact
    * rank selection with (slope, ti, tj) tie-break, and the O(m²)
    * pair frame is bounded by the period count (a year = 66k pairs —
    * metadata).
    *
    * Output: n_periods, n_pairs, slope_micro (per unit of t; lower
    * median for even pair counts). The O(m²) pair frame makes the
    * bounded contract structural at a TIGHTER default than the
    * linear read-outs: `maxPeriods` = 10⁵ (5·10⁹ pairs) — loud
    * beyond, never a silent detonation on an unaggregated stream.
    */
  def theilSenSlope(series: DataFrame, tCol: String, xCol: String,
      maxPeriods: Long = 100000L): DataFrame = {
    val s = series.sparkSession
    import s.implicits._
    val base = series.select(col(tCol).cast("long").as("t"),
      col(xCol).cast("long").as("x")).localCheckpoint()
    val m = base.count()
    require(m <= maxPeriods,
      s"theilSenSlope: $m periods exceed maxPeriods=$maxPeriods — " +
        "the O(m^2) pairwise-slope frame is a bounded-METADATA " +
        "contract; aggregate the stream to periods first (or raise " +
        "maxPeriods deliberately)")
    val b = base.select($"t".as("tj"), $"x".as("xj"))
    val pairs = base.join(b, $"t" < $"tj")
      .select($"t".as("ti"), $"tj",
        expr("CASE WHEN xj - x < 0 THEN" +
          " -((-(xj - x) * 1000000) div (tj - t))" +
          " ELSE ((xj - x) * 1000000) div (tj - t) END").as("sl"))
    val np = pairs.agg(count(lit(1)).as("n_pairs"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"sl", $"ti", $"tj") // bounded pair frame: metadata
    pairs.withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(np))
      .filter(expr("rk = (n_pairs + 1) div 2"))
      .crossJoin(broadcast(base.agg(count(lit(1)).as("n_periods"))))
      .select($"n_periods", $"n_pairs", $"sl".as("slope_micro"))
  }

  /** Mann–Kendall trend test over an aggregated series (the
    * significance companion to [[theilSenSlope]]): S = Σ_{i<j}
    * sign(x_j − x_i), tie-corrected variance
    * Var(S) = (m(m−1)(2m+5) − Σ t(t−1)(2t+5)) / 18, and the
    * continuity-corrected z = (S ∓ 1)/√Var — S and the variance
    * pieces exact integers on the bounded frame, one mirrored double
    * expression at the close.
    *
    * Output: n_periods, s_stat, z_ppm (0 when Var = 0). Same
    * structural O(m²) bound as [[theilSenSlope]]: `maxPeriods`
    * (default 10⁵), loud beyond.
    */
  def mannKendall(series: DataFrame, tCol: String, xCol: String,
      maxPeriods: Long = 100000L): DataFrame = {
    val s = series.sparkSession
    import s.implicits._
    val base = series.select(col(tCol).cast("long").as("t"),
      col(xCol).cast("long").as("x")).localCheckpoint()
    val nPer = base.count()
    require(nPer <= maxPeriods,
      s"mannKendall: $nPer periods exceed maxPeriods=$maxPeriods — " +
        "the O(m^2) sign-pair frame is a bounded-METADATA contract; " +
        "aggregate the stream to periods first (or raise maxPeriods " +
        "deliberately)")
    val b = base.select($"t".as("tj"), $"x".as("xj"))
    val ss = base.join(b, $"t" < $"tj")
      .agg(coalesce(sum(signum($"xj" - $"x").cast("long")), lit(0L))
        .as("s_stat"))
    val ties = base.groupBy($"x").agg(count(lit(1)).as("tt"))
      .agg(Exact.decSum(Exact.dec($"tt") * ($"tt" - 1) *
        ($"tt" * 2 + 5)).as("tie"), count(lit(1)).as("n_distinct"))
    val m = base.agg(count(lit(1)).as("m"))
    ss.crossJoin(ties).crossJoin(m)
      .select($"m".as("n_periods"), $"s_stat",
        expr(s"CAST(CAST(m AS ${Exact.Dec}) * (m - 1) * (2 * m + 5)" +
          " - tie AS DOUBLE) / 18.0").as("var_s"),
        $"s_stat".as("s2"))
      .select($"n_periods", $"s_stat",
        expr("CASE WHEN var_s <= 0.0 THEN 0L ELSE" +
          " CAST(floor((CASE WHEN s2 > 0 THEN CAST(s2 - 1 AS DOUBLE)" +
          " WHEN s2 < 0 THEN CAST(s2 + 1 AS DOUBLE) ELSE 0.0 END)" +
          " / sqrt(var_s) * 1000000.0 + 0.5) AS BIGINT) END")
          .as("z_ppm"))
  }

  /** Correlation ratio η² — the share of a value column's variance
    * explained by a categorical factor ("does source explain document
    * length?"), the effect size a chi-square-style p-value never
    * gives. One shuffle on the group key; exactness by the
    * chi-square-family discipline: per-group terms (s_g²·10⁶) div n_g
    * are micro-floored integer divisions (deterministic both engines,
    * truncation ≤ #groups micro), everything else exact DECIMAL:
    *   η² = (Σ_g s_g²/n_g − S²/n) / (Σ x² − S²/n),
    * clamped to [0, 10⁶] ppm against truncation at the edges.
    * The floored divisions run remainder-subtract on the DECIMAL
    * carrier ([[Exact.divFloorSql]]) — Spark's `div` narrows to
    * BIGINT and silently wraps past 2⁶³ (for mean value x̄ ~ 10³ that
    * is only ~9·10⁶ rows per group) — so they are exact to quotient
    * 10³² (n_g·x̄² ≤ 10²⁶) and the binding bound is the DECIMAL
    * product s_g²·10⁶ ≤ 10³⁸ (n_g·x̄ ≤ 10¹⁶), loud ANSI refusal
    * beyond — never silent.
    *
    * Output: n, n_groups, eta2_ppm.
    */
  def etaSquared(df: DataFrame, valueCol: String, grpCol: String)
      : DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val g = df.select(col(valueCol).cast("long").as("x"),
      when(col(grpCol).isNull,
        raise_error(lit("etaSquared: NULL in group column"))
          .cast("string"))
        .otherwise(col(grpCol).cast("string")).as("grp"))
    val per = g.groupBy($"grp")
      .agg(count(lit(1)).as("ng"), Exact.decSum($"x").as("sg"))
    val a = per.agg(
      Exact.decSum(expr(Exact.divFloorSql("sg * sg * 1000000", "ng")))
        .as("a"),
      count(lit(1)).as("n_groups"),
      Exact.decSum($"ng").as("n"), Exact.decSum($"sg").as("ss"))
    val sq = g.agg(Exact.decSum(Exact.dec($"x") * $"x").as("sxx"))
    a.crossJoin(sq)
      .select(
        Exact.asLongOrFail($"n", "etaSquared n").as("n"), $"n_groups",
        expr(s"a - ${Exact.divFloorSql("ss * ss * 1000000", "n")}")
          .as("ssb"),
        expr("sxx * 1000000 - " +
          Exact.divFloorSql("ss * ss * 1000000", "n")).as("sst"))
      .select($"n", $"n_groups",
        expr("CASE WHEN sst <= 0 THEN 0L ELSE" +
          " least(1000000L, greatest(0L," +
          " CAST((ssb * 1000000) div sst AS BIGINT))) END")
          .as("eta2_ppm"))
  }

  /** Kruskal–Wallis H (tie-corrected) — the k-group generalization of
    * [[mannWhitneyZ]]: does ANY of the k groups' value distributions
    * sit above the others? Pooled average ranks via the same
    * JOIN-FREE double-rank device: dr_v = 2·C(<v) + t_v + 1 from the
    * value histogram's prefix sums, and 2R_g = Σ_v c_{g,v}·dr_v folds
    * from the (value, group) CELL frame — the corpus is touched
    * exactly once (the map-side-combinable cell fold), the one join
    * is histogram × cells (both bounded by the distinct-value count,
    * ≤ #groups rows per key: skew-free), and the r15 hazard of
    * broadcasting a corpus-sized per-value frame back onto the rows
    * is structurally gone. With the per-group micro floor
    * q_g = ((2R_g)²·10⁶) div n_g the statistic
    *   H = [3·Σ q_g / (n(n+1)) − 3(n+1)·10⁶] · (n³−n) / (n³−n − Σ(t³−t))
    * closes in exact integer divisions (micro units) — no float
    * anywhere, clamped at 0 against per-group truncation when H = 0.
    * All-tied input (zero tie divisor) reads 0.
    *
    * Magnitude bound (loud under the ANSI carrier, never silent):
    * the per-group fold q_g runs as a remainder-subtract DECIMAL
    * division ([[Exact.divFloorSql]] — Spark's `div` narrows to
    * BIGINT and silently WRAPS past 2⁶³ even under ANSI, verified on
    * this build), exact to quotient 10³². Binding limits are the
    * DECIMAL(38,0) products: (2R_g)²·10⁶ ≤ 10³⁸ (n·n_g ≤ 10¹⁶) and
    * the tie-correction product hraw·(n³−n) ≤ 10³⁸ — overall
    * n ≲ 2·10⁸ periods/rows, i.e. uniform 5-group corpora are exact
    * past 10⁷ rows per group and refuse LOUDLY beyond (ANSI decimal
    * overflow), the kappa-family posture.
    *
    * Output: n, n_groups, h_micro.
    */
  def kruskalWallis(df: DataFrame, valueCol: String, grpCol: String)
      : DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val g = df.select(col(valueCol).cast("long").as("v"),
      when(col(grpCol).isNull,
        raise_error(lit("kruskalWallis: NULL in group column"))
          .cast("string"))
        .otherwise(col(grpCol).cast("string")).as("grp"))
    kwFold(g.groupBy($"v", $"grp").agg(count(lit(1)).as("c")))
  }

  /** [[kruskalWallis]] from pre-folded (value, group, count) cells —
    * the [[ksTwoSampleFromCounts]] delegation contract for k-group
    * monitor states. */
  def kruskalWallisFromCounts(cells: DataFrame, valueCol: String,
      grpCol: String, cntCol: String): DataFrame = {
    val s = cells.sparkSession
    import s.implicits._
    val c = cells.select(col(valueCol).cast("long").as("v"),
      when(col(grpCol).isNull,
        raise_error(lit("kruskalWallisFromCounts: NULL in group column"))
          .cast("string"))
        .otherwise(col(grpCol).cast("string")).as("grp"),
      col(cntCol).cast("long").as("n"))
    kwFold(c.groupBy($"v", $"grp").agg(sum($"n").as("c")))
  }

  /** Shared KW fold over the (v, grp, c) cell frame, pinned once
    * (bounded by distinct-values × groups): it feeds the value
    * histogram AND the dr join. */
  private def kwFold(cellsIn: DataFrame): DataFrame = {
    val cells = cellsIn.localCheckpoint()
    val s = cells.sparkSession
    import s.implicits._
    val per = cells.groupBy($"v").agg(sum($"c").as("t"))
    val dr = GlobalRank.withPrefixSum(per, Seq($"v"), "t", "ct")
      .select($"v", ($"ct" * 2 + $"t" + 1).as("dr"))
    val perg = cells.join(dr, "v")
      .groupBy($"grp")
      .agg(sum($"c").as("ng"),
        Exact.decSum(Exact.dec($"c") * $"dr").as("r2g"))
    val f = perg.agg(count(lit(1)).as("n_groups"),
      Exact.decSum($"ng").as("n"),
      Exact.decSum(expr(Exact.divFloorSql("r2g * r2g * 1000000", "ng")))
        .as("q"))
    val ties = per.agg(
      Exact.decSum(Exact.dec($"t") * $"t" * $"t" - $"t").as("tie3"))
    f.crossJoin(ties)
      .select(Exact.asLongOrFail($"n", "kruskalWallis n").as("n"),
        $"n_groups",
        expr(s"(CAST(3 AS ${Exact.Dec}) * q) div" +
          s" (CAST(n AS ${Exact.Dec}) * (n + 1))" +
          s" - CAST(3 AS ${Exact.Dec}) * (n + 1) * 1000000").as("hraw"),
        expr(s"CAST(n AS ${Exact.Dec}) * n * n - n").as("n3n"),
        $"tie3")
      .select($"n", $"n_groups",
        expr("CASE WHEN n3n - tie3 <= 0 THEN 0L ELSE" +
          " greatest(0L, CAST((hraw * n3n) div (n3n - tie3) AS BIGINT))" +
          " END").as("h_micro"))
  }

  /** Shared guard pass for the sequential detectors: ONE aggregation
    * job returns (row count, distinct periods) together — the r16
    * finding that `count` + `distinct().count` as separate actions
    * doubled the guard cost ahead of every read-out. Raises the same
    * loud errors as before: maxPeriods first, then one-row-per-period.
    * Returns the validated period count m. */
  private[graft] def guardedPeriods(base: DataFrame, op: String,
      maxPeriods: Long): Long = {
    val r = base.agg(count(lit(1)), count_distinct(col("t"))).head()
    val (m, mDist) = (r.getLong(0), r.getLong(1))
    require(m <= maxPeriods,
      s"$op: $m periods exceed maxPeriods=$maxPeriods — this " +
        "read-out runs on a bounded AGGREGATED series; aggregate the " +
        "stream to periods first (or raise maxPeriods deliberately)")
    require(mDist == m,
      s"$op: $m rows but only $mDist distinct periods — one row per " +
        "period required; aggregate the series first")
    m
  }

  /** Pettitt change-point test over an aggregated series (the
    * rank-based, distribution-free companion to [[cusumChangePoint]]:
    * a single burst day cannot fake a regime shift here). The
    * statistic U_t = Σ_{i≤t} Σ_{j>t} sign(x_i − x_j) folds in O(m)
    * via the mid-rank identity U_t = Σ_{i≤t} dr_i − t(m+1) with dr
    * the q244 double-rank (2× the average rank — all integers), so
    * the whole test is one rank pass + one time-ordered prefix sum on
    * the bounded frame; K = max_t |U_t| over t < m, ties to the
    * EARLIEST period. The approximate significance
    * p ≈ 2·exp(−6K²/(m³+m²)) is the ONE mirrored double expression.
    * Bounded contract structural as in [[autocorrelation]].
    *
    * Output: n_periods, change_t, k_stat, p_ppm (capped at 10⁶);
    * empty for m < 2 (no interior split point exists).
    */
  def pettittChangePoint(series: DataFrame, tCol: String, xCol: String,
      maxPeriods: Long = 1000000L): DataFrame = {
    val s = series.sparkSession
    import s.implicits._
    val base = series.select(col(tCol).as("t"),
      col(xCol).cast("long").as("x")).localCheckpoint()
    // duplicate period keys would make the time rank (and therefore
    // U_t) nondeterministic — refuse loudly, the maxPeriods posture.
    // ONE agg pass carries both guards (row count + distinct periods).
    val m = guardedPeriods(base, "pettittChangePoint", maxPeriods)
    val wv = org.apache.spark.sql.expressions.Window.orderBy($"x", $"t")
    val ranked = base
      .withColumn("rk", row_number().over(wv)) // bounded frame
    val dr = ranked.groupBy($"x")
      .agg((min($"rk") + max($"rk")).as("dr"))
    val wt = org.apache.spark.sql.expressions.Window.orderBy($"t")
    base.join(dr, "x")
      .withColumn("tpos", row_number().over(wt)) // bounded frame
      .withColumn("pref", sum($"dr").over(wt))
      .select($"t", $"tpos",
        ($"pref" - $"tpos" * lit(m + 1)).as("u"))
      .filter($"tpos" < m)
      .orderBy(abs($"u").desc, $"t".asc).limit(1)
      .select(lit(m).as("n_periods"), $"t".as("change_t"),
        abs($"u").as("k_stat"),
        expr(s"least(1000000L, CAST(floor(2.0" +
          " * exp(-6.0 * CAST(abs(u) AS DOUBLE) * abs(u)" +
          s" / (CAST($m AS DOUBLE) * $m * $m" +
          s" + CAST($m AS DOUBLE) * $m))" +
          " * 1000000.0 + 0.5) AS BIGINT))").as("p_ppm"))
  }

  /** Page–Hinkley-style drawup read-out over an aggregated series
    * (δ = 0): the maximum rise of the centered cumulative-sum path
    * above its own running minimum, max_t (S_t − min_{s≤t} S_s) —
    * the sequential "sustained increase" detector where
    * [[cusumChangePoint]] finds the single largest |deviation|.
    * Multiplied through by n ([[autocorrelation]]'s device) the path
    * n·S_t = Σ_{i≤t}(n·x_i − S) stays an exact DECIMAL integer; the
    * drawup is priced as a ppm share of the series' total mass (the
    * [[cusumChangePoint]] normalization). Ties to the EARLIEST
    * period. Bounded contract structural.
    *
    * Output: n_periods, peak_t, ph_ppm (0 when the series total ≤ 0).
    */
  def pageHinkleyDrawup(series: DataFrame, tCol: String, xCol: String,
      maxPeriods: Long = 1000000L): DataFrame = {
    val s = series.sparkSession
    import s.implicits._
    val base = series.select(col(tCol).as("t"),
      col(xCol).cast("long").as("x")).localCheckpoint()
    // duplicate period keys would lump tied periods into one RANGE
    // frame step while the oracle's day key cannot tie — refuse
    // loudly. ONE agg pass carries both guards.
    val m = guardedPeriods(base, "pageHinkleyDrawup", maxPeriods)
    val tot = base.agg(count(lit(1)).as("n"), Exact.decSum($"x").as("sx"))
    val wt = org.apache.spark.sql.expressions.Window.orderBy($"t")
    base.crossJoin(broadcast(tot))
      .withColumn("d", expr(s"CAST(n AS ${Exact.Dec}) * x - sx"))
      .withColumn("cs", sum($"d").over(wt)) // bounded frame
      .withColumn("dup", $"cs" - min($"cs").over(wt))
      .orderBy($"dup".desc, $"t".asc).limit(1)
      .select($"n".as("n_periods"), $"t".as("peak_t"),
        expr(s"CASE WHEN sx <= 0 THEN 0L ELSE" +
          s" CAST((dup * 1000000) div (CAST(n AS ${Exact.Dec}) * sx)" +
          " AS BIGINT) END").as("ph_ppm"))
  }

  /** Robust (median/MAD) outlier read-out over an aggregated series:
    * the day count is an outlier when its absolute deviation from the
    * series MEDIAN exceeds `factor` × MAD — the rule a single burst
    * day cannot poison, unlike mean/stddev fences (the burst inflates
    * the stddev that is supposed to flag it). Entirely exact
    * integers: both medians are exact rank selections (lower median,
    * (m+1) div 2, ties by (value, period) — the [[theilSenSlope]]
    * convention) on the bounded frame; no float anywhere.
    *
    * MAD = 0 (over half the periods share the median value) flags
    * every deviating period — the degenerate-but-correct reading of
    * the rule; callers wanting slack add it via `factor`.
    *
    * Output: n_periods, med, mad, n_outliers (an empty series reads
    * n_periods = 0 with NULL medians). Bounded contract structural
    * as in [[autocorrelation]].
    */
  def madOutliers(series: DataFrame, tCol: String, xCol: String,
      factor: Long = 5L, maxPeriods: Long = 1000000L): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val s = series.sparkSession
    import s.implicits._
    val base = series.select(col(tCol).as("t"),
      col(xCol).cast("long").as("x")).localCheckpoint()
    val m = base.count()
    require(m <= maxPeriods,
      s"madOutliers: $m periods exceed maxPeriods=$maxPeriods — " +
        "this read-out runs on a bounded AGGREGATED series; " +
        "aggregate the stream to periods first (or raise maxPeriods " +
        "deliberately)")
    val wv = org.apache.spark.sql.expressions.Window.orderBy($"x", $"t")
    val med = base
      .withColumn("rk", row_number().over(wv)) // bounded frame
      .filter($"rk" === lit((m + 1) / 2)).select($"x".as("med"))
    val dev = base.crossJoin(broadcast(med))
      .select($"t", $"med", abs($"x" - $"med").as("dev"))
    val wd = org.apache.spark.sql.expressions.Window.orderBy($"dev", $"t")
    val mad = dev
      .withColumn("rk", row_number().over(wd)) // bounded frame
      .filter($"rk" === lit((m + 1) / 2)).select($"dev".as("mad"))
    dev.crossJoin(broadcast(mad))
      .agg(count(lit(1)).as("n_periods"),
        first($"med").as("med"), first($"mad").as("mad"),
        coalesce(sum(when($"dev" > $"mad" * factor, 1L).otherwise(0L)),
          lit(0L)).as("n_outliers"))
  }

  /** Kendall tau-b from a bounded contingency: concordant/discordant
    * pair counts fold from the CELL frame (≤ bins² rows — after the
    * one corpus aggregation, the quadratic pair loop runs on
    * metadata, not data; the broadcast self-join is the documented
    * bounded carve-out). Tie corrections come from the marginals:
    *   τ_b = (C − D) / √((n₀ − n₁)(n₀ − n₂)),
    * n₀ = n(n−1)/2, n₁/n₂ = Σ r(r−1)/2 over row/col marginals. C, D
    * and the corrections stay on the DECIMAL carrier (n² magnitude);
    * the one double expression mirrors the oracle.
    *
    * Output: n, c_pairs/d_pairs (loud past 2⁶³), taub_ppm.
    */
  def kendallTauB(cells: DataFrame, xCol: String, yCol: String,
      cntCol: String): DataFrame = {
    val s = cells.sparkSession
    import s.implicits._
    val a = cells.select(col(xCol).cast("int").as("dx"),
      col(yCol).cast("int").as("dy"), col(cntCol).cast("long").as("o"))
    val b = a.select($"dx".as("bx"), $"dy".as("by"), $"o".as("bo"))
    val cd = a.crossJoin(broadcast(b))
      .agg(Exact.decSum(when($"bx" > $"dx" && $"by" > $"dy",
          Exact.dec($"o") * $"bo").otherwise(lit(0L).cast(Exact.Dec)))
          .as("c_pairs"),
        Exact.decSum(when($"bx" > $"dx" && $"by" < $"dy",
          Exact.dec($"o") * $"bo").otherwise(lit(0L).cast(Exact.Dec)))
          .as("d_pairs"))
    val n = a.agg(sum($"o").as("n"))
    val rt = a.groupBy($"dx").agg(sum($"o").as("r"))
      .agg(Exact.decSum(Exact.dec($"r") * ($"r" - 1)).as("t1x2"))
    val ct = a.groupBy($"dy").agg(sum($"o").as("c"))
      .agg(Exact.decSum(Exact.dec($"c") * ($"c" - 1)).as("t2x2"))
    cd.crossJoin(n).crossJoin(rt).crossJoin(ct)
      .select($"n",
        Exact.asLongOrFail($"c_pairs", "kendallTauB c_pairs").as("c_pairs"),
        Exact.asLongOrFail($"d_pairs", "kendallTauB d_pairs").as("d_pairs"),
        expr(s"CAST(n AS ${Exact.Dec}) * (n - 1) - t1x2").as("den1"),
        expr(s"CAST(n AS ${Exact.Dec}) * (n - 1) - t2x2").as("den2"),
        ($"c_pairs" - $"d_pairs").as("cd"))
      .select($"n", $"c_pairs", $"d_pairs",
        expr("CASE WHEN den1 <= 0 OR den2 <= 0 THEN 0L ELSE" +
          " CAST(floor(2.0 * CAST(cd AS DOUBLE)" +
          " / sqrt(CAST(den1 AS DOUBLE) * CAST(den2 AS DOUBLE))" +
          " * 1000000.0 + 0.5) AS BIGINT) END").as("taub_ppm"))
  }
}
