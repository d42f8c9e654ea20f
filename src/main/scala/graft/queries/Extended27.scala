package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Exact, Stats}
import graft.functions.TextFns
import graft.operators.GlobalRank

/** Round-15 second batch (q252–q258): the two-sample / association
  * testing shelf — the hypothesis tests a curation team runs before
  * believing a drift dashboard or a "length predicts tokens" prior.
  * All statistics are exact-integer until one final double expression
  * written literally identically in both engines
  * (see [[graft.ext.Stats]] for the folds and their 100 TB shapes):
  *
  *  - q252 exact two-sample Kolmogorov–Smirnov distance (en vs rest
  *    length distributions) — integer D·n₁n₂, prefix sums over the
  *    value histogram, never the corpus;
  *  - q253 Mann–Whitney U with tie-corrected z (token counts, en vs
  *    rest) — pooled average ranks via the double-rank device;
  *  - q254 chi-square homogeneity of length deciles across sources +
  *    Cramér's V — bounded contingency, per-cell micro-floored terms;
  *  - q255 randomization test for the en-vs-rest mean length gap —
  *    32 deterministic LCG re-labelings folded in one scan;
  *  - q256 vocabulary coverage curve — share of token occurrences
  *    covered by the top 1/10/100/1000 types, exact rank selection;
  *  - q257 deterministic weighted systematic resample (m = 100
  *    midpoint probes over the char-weight axis) — multiplicities sum
  *    to m by construction, the self-check rides in the output;
  *  - q258 Kendall tau-b on the 10×10 (length decile × token decile)
  *    contingency — concordance from marginal-tied cell counts;
  *  - q259 Benjamini–Hochberg-corrected per-language randomization
  *    tests — the multiple-testing capstone over m simultaneous
  *    drift questions;
  *  - q260 two-sample Cramér–von Mises criterion (whole-CDF
  *    complement to q252's KS);
  *  - q261 exact Wasserstein-1 transport distance (same comparison,
  *    priced in the value's own units).
  */
object Extended27 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val EnBit = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END"

  // --------------------------------------------------------------------
  // q252 — exact two-sample KS between the 'en' and non-'en' document
  // length distributions.
  def q252(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Stats.ksTwoSample(
      t(s, dir, "documents").select($"n_chars".as("v"),
        expr(EnBit).as("g")),
      "v", "g")
  }

  val q252Sql: String =
    s"""WITH d AS (SELECT CAST(n_chars AS BIGINT) AS v,
       |    $EnBit AS g FROM documents),
       | per AS (SELECT v, CAST(sum(g) AS BIGINT) AS a,
       |         CAST(count(*) AS BIGINT) AS t FROM d GROUP BY v),
       | tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
       |         CAST(sum(t) - sum(a) AS BIGINT) AS n2 FROM per),
       | cum AS (SELECT sum(a) OVER w AS ia, sum(t) OVER w AS it
       |         FROM per WINDOW w AS (ORDER BY v)),
       | dd AS (SELECT max(abs(CAST(ia AS HUGEINT) * n2
       |          - CAST(it - ia AS HUGEINT) * n1)) AS d_num
       |        FROM cum CROSS JOIN tot)
       |SELECT n1, n2, CAST(d_num AS BIGINT) AS d_num,
       |  CAST((d_num * 1000000) // (CAST(n1 AS HUGEINT) * n2) AS BIGINT)
       |    AS ks_ppm
       |FROM dd CROSS JOIN tot""".stripMargin

  // --------------------------------------------------------------------
  // q253 — Mann–Whitney U (tie-corrected z) on token counts, en vs
  // rest. The rank-based complement to q255's mean test: insensitive
  // to the long-document tail that dominates a mean.
  def q253(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Stats.mannWhitneyZ(
      t(s, dir, "documents").select(
        size(TextFns.tokens($"text")).cast("long").as("v"),
        expr(EnBit).as("g")),
      "v", "g")
  }

  val q253Sql: String =
    s"""WITH d AS (SELECT doc_id,
       |    CAST(len(${DocOps.tokensSql}) AS BIGINT) AS v,
       |    $EnBit AS g FROM documents),
       | r AS (SELECT v, doc_id, row_number() OVER (ORDER BY v, doc_id)
       |       AS rk FROM d),
       | perv AS (SELECT v, MIN(rk) + MAX(rk) AS dr,
       |          CAST(count(*) AS BIGINT) AS t FROM r GROUP BY v),
       | f AS (SELECT CAST(count(*) AS HUGEINT) AS n,
       |     CAST(sum(g) AS HUGEINT) AS n1,
       |     CAST(sum(CASE WHEN g = 1 THEN dr ELSE 0 END) AS HUGEINT)
       |       AS sdr1
       |   FROM d JOIN perv USING (v)),
       | tie AS (SELECT CAST(sum(CAST(t AS HUGEINT) * t * t - t)
       |         AS HUGEINT) AS tie3 FROM perv),
       | e AS (SELECT n, n1, n - n1 AS n2,
       |     sdr1 - n1 * (n1 + 1) AS u1x2,
       |     (n + 1) * n * (n - 1) - tie3 AS d3 FROM f CROSS JOIN tie)
       |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       |  CAST(u1x2 AS BIGINT) AS u1_x2,
       |  CASE WHEN n1 = 0 OR n2 = 0 THEN 0
       |  WHEN u1x2 < n1 * n2 THEN
       |    -CAST(((n1 * n2 - u1x2) * 1000000) // (n1 * n2) AS BIGINT)
       |  ELSE CAST(((u1x2 - n1 * n2) * 1000000) // (n1 * n2) AS BIGINT)
       |  END AS cliffs_delta_ppm,
       |  CASE WHEN d3 <= 0 OR n1 = 0 OR n2 = 0 THEN 0
       |  ELSE CAST(floor(CAST(u1x2 - n1 * n2 AS DOUBLE)
       |    / (2.0 * sqrt(CAST(n1 AS DOUBLE) * n2 * CAST(d3 AS DOUBLE)
       |      / (12.0 * CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))
       |    * 1000000.0 + 0.5) AS BIGINT) END AS z_ppm
       |FROM e""".stripMargin

  // --------------------------------------------------------------------
  // q254 — chi-square homogeneity of the length-decile distribution
  // across sources, with Cramér's V as the bounded effect size.
  // Deciles via the two-pass GlobalRank.withNtile (ntile semantics
  // exactly); the contingency is 10 × n_sources — bounded metadata.
  def q254(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val binned = GlobalRank.withNtile(
      t(s, dir, "documents").select($"doc_id", $"n_chars", $"source"),
      Seq($"n_chars", $"doc_id"), tiles = 10, tileCol = "decile")
    Stats.chiSquareHomogeneity(binned, "decile", "source")
  }

  val q254Sql: String =
    """WITH b AS (SELECT ntile(10) OVER (ORDER BY n_chars, doc_id)
      |    AS bin, source AS grp FROM documents),
      | cells AS (SELECT bin, grp, CAST(count(*) AS BIGINT) AS o
      |           FROM b GROUP BY bin, grp),
      | rt AS (SELECT bin, CAST(sum(o) AS BIGINT) AS r FROM cells
      |        GROUP BY bin),
      | ct AS (SELECT grp, CAST(sum(o) AS BIGINT) AS c FROM cells
      |        GROUP BY grp),
      | tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
      |     CAST(count(DISTINCT bin) AS BIGINT) AS n_bins,
      |     CAST(count(DISTINCT grp) AS BIGINT) AS n_groups FROM cells),
      | f AS (SELECT CAST(sum((CAST(o AS HUGEINT) * o * n * 1000000)
      |       // (CAST(rt.r AS HUGEINT) * ct.c)) AS HUGEINT) AS st
      |   FROM cells JOIN rt USING (bin) JOIN ct USING (grp)
      |   CROSS JOIN tot),
      | e AS (SELECT n, n_bins, n_groups,
      |     (n_bins - 1) * (n_groups - 1) AS dof,
      |     greatest(CAST(0 AS HUGEINT),
      |       st - CAST(n AS HUGEINT) * 1000000) AS chi2
      |   FROM f CROSS JOIN tot)
      |SELECT n, n_bins, n_groups, dof,
      |  CAST(chi2 AS BIGINT) AS chi2_micro,
      |  CASE WHEN dof = 0 THEN 0
      |  ELSE CAST(floor(sqrt(CAST(chi2 AS DOUBLE) / 1000000.0
      |    / (CAST(n AS DOUBLE) * least(n_bins - 1, n_groups - 1)))
      |    * 1000000.0 + 0.5) AS BIGINT) END AS cramers_v_ppm
      |FROM e""".stripMargin

  // --------------------------------------------------------------------
  // q255 — randomization test: is the en-vs-rest mean length gap
  // larger than chance re-labelings produce? B = 32 deterministic
  // LCG coin-flip replicates, all folded in one scan.
  private val PermReps = 32

  def q255(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Stats.permutationMeanDiff(
      t(s, dir, "documents").select($"doc_id", $"n_chars".as("x"),
        expr(EnBit).as("g")),
      "x", "g", "doc_id", PermReps)
  }

  val q255Sql: String =
    s"""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
       |    $EnBit AS g FROM documents),
       | obs AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |     CAST(abs((CAST(sum(CASE WHEN g = 1 THEN x ELSE 0 END)
       |         AS HUGEINT) * 1000000000)
       |         // sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)
       |       - (CAST(sum(CASE WHEN g = 0 THEN x ELSE 0 END)
       |         AS HUGEINT) * 1000000000)
       |         // sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)) AS BIGINT)
       |       AS obs_diff_nano
       |   FROM d),
       | w AS (SELECT t.b, d.x,
       |     ${Stats.lcgBitSql(s"d.doc_id * $PermReps + t.b")} AS bit
       |   FROM d CROSS JOIN generate_series(0, ${PermReps - 1}) t(b)),
       | pr AS (SELECT b, CAST(count(*) AS BIGINT) AS nr,
       |     CAST(sum(bit) AS BIGINT) AS nra,
       |     CAST(sum(CASE WHEN bit = 1 THEN x ELSE 0 END) AS HUGEINT)
       |       AS sra,
       |     CAST(sum(CASE WHEN bit = 0 THEN x ELSE 0 END) AS HUGEINT)
       |       AS srb
       |   FROM w GROUP BY b),
       | pd AS (SELECT b, CASE WHEN nra = 0 OR nra = nr THEN NULL
       |     ELSE CAST(abs((sra * 1000000000) // nra
       |       - (srb * 1000000000) // (nr - nra)) AS BIGINT) END
       |     AS diff_nano FROM pr),
       | agg AS (SELECT CAST(count(*) AS BIGINT) AS b_reps,
       |     CAST(sum(CASE WHEN diff_nano IS NULL
       |       OR diff_nano >= obs_diff_nano THEN 1 ELSE 0 END)
       |       AS BIGINT) AS b_ge
       |   FROM pd CROSS JOIN obs)
       |SELECT obs.n, agg.b_reps, obs.obs_diff_nano, agg.b_ge,
       |  CAST(((1 + agg.b_ge) * 1000000) // (agg.b_reps + 1) AS BIGINT)
       |    AS p_ppm
       |FROM agg CROSS JOIN obs""".stripMargin

  // --------------------------------------------------------------------
  // q256 — vocabulary coverage curve: what share of all token
  // occurrences do the top 1 / 10 / 100 / 1000 types cover? The Zipf
  // read-out that prices a vocabulary (or a blocklist) before
  // building it. Exact rank selection over the type histogram via
  // withRankAndPrefixSum — one sort of the TYPE frame, never the
  // token stream.
  private val CoverageKs = Seq(1L, 10L, 100L, 1000L)

  def q256(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = t(s, dir, "documents")
      .select(explode(TextFns.tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
    Stats.coverageCurve(counts, "tok", "cnt", CoverageKs)
  }

  val q256Sql: String =
    s"""WITH tk AS (SELECT unnest(${DocOps.tokensSql}) AS tok
       |            FROM documents),
       | counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
       |            FROM tk GROUP BY tok),
       | ranked AS (SELECT tok, cnt,
       |     row_number() OVER (ORDER BY cnt DESC, tok) AS rk,
       |     coalesce(sum(cnt) OVER (ORDER BY cnt DESC, tok
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |       AS cb
       |   FROM counts),
       | tot AS (SELECT CAST(sum(cnt) AS HUGEINT) AS tt,
       |         CAST(count(*) AS BIGINT) AS n_types FROM counts),
       | ks AS (SELECT CAST(k AS BIGINT) AS k
       |        FROM (VALUES (1), (10), (100), (1000)) v(k)),
       | ke AS (SELECT k, least(k, n_types) AS keff, tt
       |        FROM ks CROSS JOIN tot)
       |SELECT k, keff AS types_used,
       |  CAST((CAST(cb + cnt AS HUGEINT) * 1000000) // tt AS BIGINT)
       |    AS coverage_ppm
       |FROM ke JOIN ranked ON ranked.rk = ke.keff
       |ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q257 — deterministic weighted systematic resample, m = 100 probes
  // over the character-weight axis. mult_total = m is a structural
  // invariant (telescoping count) and rides in the output as the
  // self-check; the resampled mean is char-weighted (length-biased)
  // by construction — the contrast with the raw corpus mean is the
  // read-out.
  private val ResampleM = 100

  def q257(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents").select($"doc_id", $"n_chars")
    val r = Stats.systematicResample(docs, "doc_id", "n_chars", ResampleM)
    val tot = docs.agg(sum($"n_chars".cast("long")).as("tw"),
      count(lit(1)).as("nn"))
    r.crossJoin(tot)
      .agg(first($"nn").as("n"),
        sum(when($"mult" > 0, 1L).otherwise(0L)).as("n_selected"),
        sum($"mult").as("mult_total"),
        Exact.decSum($"mult" * $"w").as("sw"),
        Exact.decSum(Exact.dec($"id") * $"mult").as("idw"),
        first($"tw").as("tw"))
      .select($"n", $"n_selected", $"mult_total",
        expr(s"CAST((sw * 1000000) div $ResampleM AS BIGINT)")
          .as("resample_mean_micro"),
        expr(s"CAST((CAST(tw AS ${Exact.Dec}) * 1000000) div n AS BIGINT)")
          .as("corpus_mean_micro"),
        Exact.asLongOrFail($"idw", "q257 id_weighted_sum")
          .as("id_weighted_sum"))
  }

  val q257Sql: String =
    s"""WITH d AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS w
       |           FROM documents),
       | pre AS (SELECT id, w, coalesce(sum(w) OVER (ORDER BY id
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
       |   FROM d),
       | tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw,
       |         CAST(count(*) AS BIGINT) AS n FROM d),
       | mm AS (SELECT id, w,
       |     (CASE WHEN 2 * $ResampleM * (c + w) <= tw THEN 0
       |      ELSE least($ResampleM,
       |        (2 * $ResampleM * (c + w) - tw - 1) // (2 * tw) + 1) END)
       |   - (CASE WHEN 2 * $ResampleM * c <= tw THEN 0
       |      ELSE least($ResampleM,
       |        (2 * $ResampleM * c - tw - 1) // (2 * tw) + 1) END)
       |     AS mult
       |   FROM pre CROSS JOIN tot)
       |SELECT tot.n,
       |  CAST(sum(CASE WHEN mult > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_selected,
       |  CAST(sum(mult) AS BIGINT) AS mult_total,
       |  CAST((CAST(sum(CAST(mult AS HUGEINT) * w) AS HUGEINT)
       |    * 1000000) // $ResampleM AS BIGINT) AS resample_mean_micro,
       |  CAST((CAST(tot.tw AS HUGEINT) * 1000000) // tot.n AS BIGINT)
       |    AS corpus_mean_micro,
       |  CAST(sum(CAST(id AS HUGEINT) * mult) AS BIGINT)
       |    AS id_weighted_sum
       |FROM mm CROSS JOIN tot GROUP BY tot.n, tot.tw""".stripMargin

  // --------------------------------------------------------------------
  // q258 — Kendall tau-b between length deciles and token-count
  // deciles: the tie-robust rank association to set against q244's
  // Spearman. Two ntile passes bin the corpus; everything after runs
  // on the ≤ 100-cell contingency.
  def q258(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "documents").select($"doc_id",
      $"n_chars".cast("long").as("x"),
      size(TextFns.tokens($"text")).cast("long").as("y"))
    val withX = GlobalRank.withNtile(base, Seq($"x", $"doc_id"),
      tiles = 10, tileCol = "dx")
    val withXY = GlobalRank.withNtile(withX, Seq($"y", $"doc_id"),
      tiles = 10, tileCol = "dy")
    val cells = withXY.groupBy($"dx", $"dy").agg(count(lit(1)).as("o"))
    Stats.kendallTauB(cells, "dx", "dy", "o")
  }

  val q258Sql: String =
    s"""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
       |    CAST(len(${DocOps.tokensSql}) AS BIGINT) AS y
       |  FROM documents),
       | b AS (SELECT ntile(10) OVER (ORDER BY x, doc_id) AS dx,
       |     ntile(10) OVER (ORDER BY y, doc_id) AS dy FROM d),
       | cells AS (SELECT dx, dy, CAST(count(*) AS BIGINT) AS o
       |           FROM b GROUP BY dx, dy),
       | cd AS (SELECT
       |     CAST(coalesce(sum(CASE WHEN b2.dx > a.dx AND b2.dy > a.dy
       |       THEN CAST(a.o AS HUGEINT) * b2.o END), 0) AS HUGEINT)
       |       AS c_pairs,
       |     CAST(coalesce(sum(CASE WHEN b2.dx > a.dx AND b2.dy < a.dy
       |       THEN CAST(a.o AS HUGEINT) * b2.o END), 0) AS HUGEINT)
       |       AS d_pairs
       |   FROM cells a CROSS JOIN cells b2),
       | nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
       | rt AS (SELECT CAST(sum(CAST(r AS HUGEINT) * (r - 1)) AS HUGEINT)
       |        AS t1x2 FROM (SELECT sum(o) AS r FROM cells GROUP BY dx)),
       | ct AS (SELECT CAST(sum(CAST(c AS HUGEINT) * (c - 1)) AS HUGEINT)
       |        AS t2x2 FROM (SELECT sum(o) AS c FROM cells GROUP BY dy)),
       | e AS (SELECT n, c_pairs, d_pairs,
       |     CAST(n AS HUGEINT) * (n - 1) - t1x2 AS den1,
       |     CAST(n AS HUGEINT) * (n - 1) - t2x2 AS den2
       |   FROM cd CROSS JOIN nn CROSS JOIN rt CROSS JOIN ct)
       |SELECT n, CAST(c_pairs AS BIGINT) AS c_pairs,
       |  CAST(d_pairs AS BIGINT) AS d_pairs,
       |  CASE WHEN den1 <= 0 OR den2 <= 0 THEN 0
       |  ELSE CAST(floor(2.0 * CAST(c_pairs - d_pairs AS DOUBLE)
       |    / sqrt(CAST(den1 AS DOUBLE) * CAST(den2 AS DOUBLE))
       |    * 1000000.0 + 0.5) AS BIGINT) END AS taub_ppm
       |FROM e""".stripMargin

  // --------------------------------------------------------------------
  // q259 — Benjamini–Hochberg-corrected randomization tests: which
  // LANGUAGES' mean document length really differs from the rest of
  // the corpus, after correcting for running one test per language?
  // B = 128 size-matched binomial re-labelings per test, all folded
  // from one n·m·B scan; BH selection runs on the m-row p frame.
  // Resolution: reps + 1 = 129 ≥ m/α = 100 (the fold is loud below).
  private val BhReps = 128
  private val BhAlphaPpm = 50000L
  private val BhLangs = 5 // the corpus' language count, pinned in the seed

  def q259(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    // the oracle bakes BhLangs into every LCG seed — assert the
    // fixture LOUDLY (the muVs/Dim discipline) instead of letting a
    // changed language count surface as an opaque hash mismatch
    val m = docs.select($"lang").distinct().count()
    require(m == BhLangs,
      s"q259 oracle is encoded for $BhLangs languages; fixture has $m")
    Stats.bhRandomizationTests(
      docs.select($"doc_id", $"n_chars", $"lang"),
      "n_chars", "lang", "doc_id", BhReps, BhAlphaPpm)
  }

  val q259Sql: String = {
    val seed = s"(d.id * $BhLangs + c.gidx) * $BhReps + t.b"
    s"""WITH d AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS x,
       |    lang AS grp FROM documents),
       | tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(x) AS HUGEINT) AS sx FROM d),
       | perg AS (SELECT grp, CAST(count(*) AS BIGINT) AS ng,
       |          CAST(sum(x) AS HUGEINT) AS sg FROM d GROUP BY grp),
       | cats AS (SELECT grp, ng,
       |     CAST(row_number() OVER (ORDER BY grp) - 1 AS BIGINT) AS gidx,
       |     CAST((CAST(ng AS HUGEINT) * 2147483648) // n AS BIGINT)
       |       AS thr,
       |     CAST(abs((sg * 1000000000) // ng
       |       - ((sx - sg) * 1000000000) // (n - ng)) AS BIGINT)
       |       AS obs_diff_nano
       |   FROM perg CROSS JOIN tot),
       | ex AS (SELECT d.x, c.grp AS test_grp, t.b,
       |     CASE WHEN ${Stats.lcgU31Sql(seed)} < c.thr THEN 1 ELSE 0 END
       |       AS coin
       |   FROM d CROSS JOIN cats c
       |   CROSS JOIN generate_series(0, ${BhReps - 1}) t(b)),
       | pr AS (SELECT test_grp, b, CAST(count(*) AS BIGINT) AS nr,
       |     CAST(sum(coin) AS BIGINT) AS nra,
       |     CAST(sum(CASE WHEN coin = 1 THEN x ELSE 0 END) AS HUGEINT)
       |       AS sra,
       |     CAST(sum(x) AS HUGEINT) AS srt
       |   FROM ex GROUP BY test_grp, b),
       | pd AS (SELECT test_grp, CASE WHEN nra = 0 OR nra = nr THEN NULL
       |     ELSE CAST(abs((sra * 1000000000) // nra
       |       - ((srt - sra) * 1000000000) // (nr - nra)) AS BIGINT) END
       |     AS diff_nano FROM pr),
       | ps AS (SELECT c.grp, c.ng AS n_g, c.obs_diff_nano,
       |     ((CAST(sum(CASE WHEN pd.diff_nano IS NULL
       |       OR pd.diff_nano >= c.obs_diff_nano THEN 1 ELSE 0 END)
       |       AS BIGINT) + 1) * 1000000) // ${BhReps + 1} AS p_ppm
       |   FROM pd JOIN cats c ON pd.test_grp = c.grp
       |   GROUP BY c.grp, c.ng, c.obs_diff_nano),
       | fl AS (SELECT grp, n_g, obs_diff_nano, p_ppm,
       |     CAST(row_number() OVER (ORDER BY p_ppm, grp) AS BIGINT)
       |       AS bh_k FROM ps),
       | ks AS (SELECT coalesce(max(CASE WHEN p_ppm * $BhLangs
       |     <= $BhAlphaPpm * bh_k THEN bh_k END), 0) AS kstar FROM fl)
       |SELECT grp, n_g, obs_diff_nano, p_ppm, bh_k,
       |  CAST(CASE WHEN bh_k <= kstar THEN 1 ELSE 0 END AS BIGINT)
       |    AS bh_reject
       |FROM fl CROSS JOIN ks ORDER BY grp""".stripMargin
  }

  // --------------------------------------------------------------------
  // q260 — two-sample Cramér–von Mises criterion on the same en-vs-
  // rest length comparison as q252: the whole-CDF statistic that
  // sees a broad small shift where KS only prices the worst point.
  def q260(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Stats.cvmTwoSample(
      t(s, dir, "documents").select($"n_chars".as("v"),
        expr(EnBit).as("g")),
      "v", "g")
  }

  val q260Sql: String =
    s"""WITH d AS (SELECT CAST(n_chars AS BIGINT) AS v,
       |    $EnBit AS g FROM documents),
       | per AS (SELECT v, CAST(sum(g) AS BIGINT) AS a,
       |         CAST(count(*) AS BIGINT) AS t FROM d GROUP BY v),
       | tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
       |         CAST(sum(t) - sum(a) AS BIGINT) AS n2 FROM per),
       | cum AS (SELECT t, sum(a) OVER w AS ia, sum(t) OVER w AS it
       |         FROM per WINDOW w AS (ORDER BY v)),
       | dp AS (SELECT t, (abs(CAST(ia AS HUGEINT) * n2
       |     - CAST(it - ia AS HUGEINT) * n1) * 1000000)
       |     // (CAST(n1 AS HUGEINT) * n2) AS dppm
       |   FROM cum CROSS JOIN tot),
       | f AS (SELECT CAST(sum(CAST(t AS HUGEINT) * dppm * dppm)
       |       AS HUGEINT) AS sq FROM dp)
       |SELECT n1, n2,
       |  CAST(CAST(n1 AS HUGEINT) * n2 * (sq // 1000000)
       |    // (CAST(n1 + n2 AS HUGEINT) * (n1 + n2)) AS BIGINT)
       |    AS t_micro
       |FROM f CROSS JOIN tot""".stripMargin

  // --------------------------------------------------------------------
  // q261 — exact Wasserstein-1 distance between the en and non-en
  // length distributions: "how many characters does it cost to morph
  // one distribution into the other" — the transport view that
  // completes the q252/q260 shelf in the value's own units.
  def q261(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Stats.wasserstein1(
      t(s, dir, "documents").select($"n_chars".as("v"),
        expr(EnBit).as("g")),
      "v", "g")
  }

  val q261Sql: String =
    s"""WITH d AS (SELECT CAST(n_chars AS BIGINT) AS v,
       |    $EnBit AS g FROM documents),
       | per AS (SELECT v, CAST(sum(g) AS BIGINT) AS a,
       |         CAST(count(*) AS BIGINT) AS t FROM d GROUP BY v),
       | tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
       |         CAST(sum(t) - sum(a) AS BIGINT) AS n2 FROM per),
       | cum AS (SELECT v, row_number() OVER (ORDER BY v) AS rk,
       |     sum(a) OVER w AS ia, sum(t) OVER w AS it
       |   FROM per WINDOW w AS (ORDER BY v)),
       | seg AS (SELECT abs(CAST(c1.ia AS HUGEINT) * n2
       |     - CAST(c1.it - c1.ia AS HUGEINT) * n1) * (c2.v - c1.v)
       |     AS seg
       |   FROM cum c1 JOIN cum c2 ON c2.rk = c1.rk + 1 CROSS JOIN tot),
       | f AS (SELECT CAST(coalesce(sum(seg), 0) AS HUGEINT) AS w
       |       FROM seg)
       |SELECT n1, n2,
       |  CAST((w * 1000000) // (CAST(n1 AS HUGEINT) * n2) AS BIGINT)
       |    AS w1_micro
       |FROM f CROSS JOIN tot""".stripMargin

  // --------------------------------------------------------------------
  // q262 — per-source PSI (population stability index) over global
  // length deciles: the industry-dashboard drift number beside q225's
  // JSD, Laplace-smoothed (+1 per cell both sides) so it stays finite
  // on bins a source never hits. Same mergeable-cells fold the
  // streaming monitor reads (Drift.psiFromCounts).
  def q262(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val binned = GlobalRank.withNtile(docs,
      Seq(col("n_chars"), col("doc_id")), tiles = 10, tileCol = "bin")
    graft.ext.Drift.psiBinned(binned, "source", "bin")
  }

  val q262Sql: String = {
    val p = "(CAST(ngb + 1 AS DOUBLE) / CAST(ng + nbins AS DOUBLE))"
    val q = "(CAST(nb - ngb + 1 AS DOUBLE)" +
      " / CAST(n - ng + nbins AS DOUBLE))"
    s"""WITH b AS (SELECT source,
       |     ntile(10) OVER (ORDER BY n_chars, doc_id) AS bin
       |   FROM documents),
       | cc AS (SELECT source, bin, count(*) AS ngb FROM b GROUP BY 1, 2),
       | bt AS (SELECT bin, count(*) AS nb FROM b GROUP BY 1),
       | gt AS (SELECT source, count(*) AS ng FROM b GROUP BY 1),
       | tot AS (SELECT count(*) AS n FROM b),
       | nbs AS (SELECT count(DISTINCT bin) AS nbins FROM cc),
       | grid AS (SELECT gt.source, gt.ng, bt.bin, bt.nb, tot.n,
       |            nbs.nbins, coalesce(cc.ngb, 0) AS ngb
       |          FROM gt CROSS JOIN bt CROSS JOIN tot CROSS JOIN nbs
       |          LEFT JOIN cc ON cc.source = gt.source
       |            AND cc.bin = bt.bin),
       | terms AS (SELECT source, ng, CAST(floor((
       |     CASE WHEN n - ng > 0 THEN ($p - $q) * ln($p / $q)
       |     ELSE 0.0 END) * 1000000000.0 + 0.5) AS BIGINT) AS t
       |   FROM grid)
       |SELECT source, ng AS n, CAST(sum(t) AS BIGINT) AS psi_nano
       |FROM terms GROUP BY source, ng
       |ORDER BY source""".stripMargin
  }

  // --------------------------------------------------------------------
  // q263 — per-source exact binned two-sample KS over the same decile
  // grid: the integer-exact member of the drift trio (q225 JSD, q262
  // PSI) — no float anywhere, the worst CDF point in ppm.
  def q263(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val binned = GlobalRank.withNtile(docs,
      Seq(col("n_chars"), col("doc_id")), tiles = 10, tileCol = "bin")
    graft.ext.Drift.ksBinned(binned, "source", "bin")
  }

  val q263Sql: String =
    """WITH b AS (SELECT source,
      |     ntile(10) OVER (ORDER BY n_chars, doc_id) AS bin
      |   FROM documents),
      | cc AS (SELECT source, bin, count(*) AS ngb FROM b GROUP BY 1, 2),
      | bt AS (SELECT bin, count(*) AS nb FROM b GROUP BY 1),
      | gt AS (SELECT source, count(*) AS ng FROM b GROUP BY 1),
      | tot AS (SELECT count(*) AS n FROM b),
      | grid AS (SELECT gt.source, gt.ng, bt.bin, bt.nb, tot.n,
      |            coalesce(cc.ngb, 0) AS ngb
      |          FROM gt CROSS JOIN bt CROSS JOIN tot
      |          LEFT JOIN cc ON cc.source = gt.source
      |            AND cc.bin = bt.bin),
      | cum AS (SELECT source, ng, n,
      |     sum(ngb) OVER (PARTITION BY source ORDER BY bin) AS cg,
      |     sum(nb - ngb) OVER (PARTITION BY source ORDER BY bin) AS cr
      |   FROM grid),
      | dd AS (SELECT source, ng, n,
      |     max(abs(CAST(cg AS HUGEINT) * (n - ng)
      |       - CAST(cr AS HUGEINT) * ng)) AS d
      |   FROM cum GROUP BY source, ng, n)
      |SELECT source, CAST(ng AS BIGINT) AS n,
      |  CASE WHEN n - ng <= 0 THEN 0
      |  ELSE CAST((d * 1000000) // (CAST(ng AS HUGEINT) * (n - ng))
      |    AS BIGINT) END AS ks_ppm
      |FROM dd ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // q264 — isotonic (PAV) calibration of the centroid classifier's
  // reliability table: the deployable monotone accuracy-vs-confidence
  // curve, fitted by the max-min closed form on the 10-bin frame.
  def q264(s: SparkSession, dir: String): DataFrame = {
    val scored = graft.ext.Eval.centroidScoredPredictions(
      t(s, dir, "embeddings"), "embedding", "label")
    val cells = graft.ext.Eval.binCounts(graft.ext.Eval.scoredRows(
      scored, "label", "pred", "conf_micro", bins = 10,
      what = "q264_isotonic"))
    Stats.isotonicCalibration(cells, "bin", "n", "correct")
  }

  val q264Sql: String =
    s"""WITH ${CentroidPredOracle.chain},
       | scr AS (SELECT label, pred,
       |           CAST(floor(score * 1000000.0 + 0.5) AS BIGINT) AS cm
       |         FROM pred),
       | binned AS (SELECT
       |     greatest(least((cm * 10) // 1000000, 9), 0) AS bin,
       |     CASE WHEN label = pred THEN 1 ELSE 0 END AS ok FROM scr),
       | per AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(ok) AS BIGINT) AS ok FROM binned GROUP BY bin),
       | pref AS (SELECT bin, n, ok, sum(n) OVER (ORDER BY bin) AS pn,
       |          sum(ok) OVER (ORDER BY bin) AS pok FROM per),
       | iv AS (SELECT j.bin AS jbin, k.bin AS kbin,
       |     ((CAST(k.pok AS HUGEINT) - (j.pok - j.ok)) * 1000000)
       |       // (k.pn - (j.pn - j.n)) AS avg_micro
       |   FROM pref j JOIN pref k ON j.bin <= k.bin),
       | mn AS (SELECT p.bin, iv.jbin, min(iv.avg_micro) AS mn
       |   FROM per p JOIN iv ON iv.jbin <= p.bin AND p.bin <= iv.kbin
       |   GROUP BY p.bin, iv.jbin),
       | ft AS (SELECT bin, CAST(max(mn) AS BIGINT) AS fitted_micro
       |        FROM mn GROUP BY bin)
       |SELECT CAST(p.bin AS BIGINT) AS bin, p.n,
       |  CAST((CAST(p.ok AS HUGEINT) * 1000000) // p.n AS BIGINT)
       |    AS acc_micro,
       |  ft.fitted_micro
       |FROM per p JOIN ft USING (bin) ORDER BY bin""".stripMargin

  // --------------------------------------------------------------------
  // q265 — ROUGE-1/2 F1 + BLEU-2 over the LSH near-duplicate
  // candidate pairs: the interpretable "how alike, exactly" verifier
  // between the band join (cheap, coarse) and a keep/drop decision.
  // Same candidate generator as q248's yield curve, so the two
  // read-outs price the same pipeline stage.
  def q265(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = graft.ext.TextDedup.lshCandidates(
      docs, "text", "doc_id", ngram = 3, numHashes = 4, bands = 1)
    graft.ext.TextEval.rougeBleuPairs(docs, pairs, "doc_id", "text")
  }

  val q265Sql: String = {
    val ng = DocOps.ngramsSql(3)
    val bigrams = """list_transform(
      |     generate_series(1, greatest(len(t) - 1, 1)),
      |     i -> array_to_string(list_slice(t, i, i + 1), ' '))"""
      .stripMargin
    s"""WITH sig AS (
       | SELECT doc_id,
       |  ${DocOps.minhashChunkSql(ng, 0)} || '|' ||
       |  ${DocOps.minhashChunkSql(ng, 1)} || '|' ||
       |  ${DocOps.minhashChunkSql(ng, 2)} || '|' ||
       |  ${DocOps.minhashChunkSql(ng, 3)} AS band
       | FROM documents),
       | pairs AS (SELECT a.doc_id AS ia, b.doc_id AS ib
       |           FROM sig a JOIN sig b
       |             ON a.band = b.band AND a.doc_id < b.doc_id),
       | tk AS (SELECT doc_id AS id, ${DocOps.tokensSql} AS t
       |        FROM documents),
       | uc AS (SELECT id, g, count(*) AS c FROM
       |          (SELECT id, unnest(t) AS g FROM tk) GROUP BY id, g),
       | bc AS (SELECT id, g, count(*) AS c FROM
       |          (SELECT id, unnest($bigrams) AS g FROM tk)
       |        GROUP BY id, g),
       | lens AS (SELECT id, CAST(len(t) AS BIGINT) AS l1,
       |          CAST(greatest(len(t) - 1, 1) AS BIGINT) AS l2 FROM tk),
       | o1 AS (SELECT p.ia, p.ib,
       |          CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov1
       |        FROM pairs p JOIN uc a ON a.id = p.ia
       |        JOIN uc b ON b.id = p.ib AND b.g = a.g GROUP BY 1, 2),
       | o2 AS (SELECT p.ia, p.ib,
       |          CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov2
       |        FROM pairs p JOIN bc a ON a.id = p.ia
       |        JOIN bc b ON b.id = p.ib AND b.g = a.g GROUP BY 1, 2),
       | j AS (SELECT p.ia, p.ib,
       |     coalesce(o1.ov1, 0) AS ov1, coalesce(o2.ov2, 0) AS ov2,
       |     la.l1 AS l1a, la.l2 AS l2a, lb.l1 AS l1b, lb.l2 AS l2b
       |   FROM pairs p
       |   LEFT JOIN o1 ON o1.ia = p.ia AND o1.ib = p.ib
       |   LEFT JOIN o2 ON o2.ia = p.ia AND o2.ib = p.ib
       |   JOIN lens la ON la.id = p.ia
       |   JOIN lens lb ON lb.id = p.ib)
       |SELECT ia, ib,
       |  CAST((2 * ov1 * 1000000) // (l1a + l1b) AS BIGINT)
       |    AS rouge1_f_ppm,
       |  CAST((2 * ov2 * 1000000) // (l2a + l2b) AS BIGINT)
       |    AS rouge2_f_ppm,
       |  CASE WHEN ov1 = 0 OR ov2 = 0 THEN 0 ELSE CAST(floor(
       |    (CASE WHEN l1b >= l1a THEN 1.0
       |     ELSE exp(1.0 - CAST(l1a AS DOUBLE) / CAST(l1b AS DOUBLE))
       |     END)
       |    * sqrt((CAST(ov1 AS DOUBLE) / l1b)
       |    * (CAST(ov2 AS DOUBLE) / l2b))
       |    * 1000000.0 + 0.5) AS BIGINT) END AS bleu2_ppm
       |FROM j ORDER BY ia, ib""".stripMargin
  }

  /** Name → query, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q265_rouge_bleu_pairs" -> (q265 _),
    "q262_psi_drift" -> (q262 _),
    "q263_binned_ks_drift" -> (q263 _),
    "q264_isotonic_calibration" -> (q264 _),
    "q252_ks_two_sample" -> (q252 _),
    "q259_bh_lang_drift" -> (q259 _),
    "q260_cvm_two_sample" -> (q260 _),
    "q261_wasserstein1" -> (q261 _),
    "q253_mann_whitney" -> (q253 _),
    "q254_chi2_homogeneity" -> (q254 _),
    "q255_permutation_test" -> (q255 _),
    "q256_vocab_coverage" -> (q256 _),
    "q257_systematic_resample" -> (q257 _),
    "q258_kendall_taub" -> (q258 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q265_rouge_bleu_pairs" -> q265Sql,
    "q262_psi_drift" -> q262Sql,
    "q263_binned_ks_drift" -> q263Sql,
    "q264_isotonic_calibration" -> q264Sql,
    "q252_ks_two_sample" -> q252Sql,
    "q259_bh_lang_drift" -> q259Sql,
    "q260_cvm_two_sample" -> q260Sql,
    "q261_wasserstein1" -> q261Sql,
    "q253_mann_whitney" -> q253Sql,
    "q254_chi2_homogeneity" -> q254Sql,
    "q255_permutation_test" -> q255Sql,
    "q256_vocab_coverage" -> q256Sql,
    "q257_systematic_resample" -> q257Sql,
    "q258_kendall_taub" -> q258Sql
  )
}
