package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12/13 batch (q201–q210):
  *
  *  - q210 per-source corpus datasheet
  *    ([[graft.ext.Profile.datasheet]]): the dataset-card summary row
  *    — totals, integer mean length, short-doc and exact-dup ppm,
  *    language spread, majority language — two map-side-combinable
  *    aggregations, integer-exact throughout.
  *
  *  - q209 incremental IVF-PQ append: second half of the corpus
  *    encoded under FROZEN codebooks
  *    ([[graft.ext.VectorIndex.ivfPqAppend]]) and probed — the
  *    maintenance path of the ladder, gated by training the oracle
  *    chain on the same old-rows predicate.
  *
  *  - q208 TextRank keywords: PageRank over the adjacent-token
  *    co-occurrence graph ([[graft.ext.Profile.textRankKeywords]]),
  *    token strings as node ids, 3 supersteps of q134's integer-ppt
  *    rank arithmetic.
  *
  *  - q207 stratified exact-count split: per-source val/test holdouts
  *    with guaranteed integer allocations
  *    ([[graft.ext.TrainPrep.stratifiedSplit]]), ranked by the keyed
  *    two-pass prefix sums instead of a per-source window.
  *
  *  - q206 binary-quantization rung priced: 1-bit-per-dim sign codes
  *    ([[graft.functions.VectorFns.signBucket]] packed to ONE long,
  *    distance = XOR+popcount) ranked direct and through the same
  *    R = 30 [[graft.ext.VectorIndex.refineExact]] pass as q204 — the
  *    training-free end of the compression ladder, 32× smaller scans
  *    than float32 at d = 64, wholly integer-deterministic.
  *
  *  - q205 Matryoshka prefix-dims priced: recall@10 of cosine over
  *    only the first d ∈ {8, 16, 32, 64} stored components against the
  *    full-dim brute-force top-10 — the nested-prefix serving read-out
  *    of Kusupati et al. (NeurIPS 2022), where a shorter prefix cuts
  *    scan bytes and FLOPs by 64/d and the table prices what that
  *    costs in recall.
  *
  *  - q204 refine rung priced: q200's IVF-PQ index probed for an
  *    R = 30 ADC shortlist, re-ranked exactly via
  *    [[graft.ext.VectorIndex.refineExact]] (a broadcast semi-join
  *    touching only R raw vectors), against the direct ADC top-10 —
  *    the third stage of the Jégou/Douze/Schmid search ladder, sharing
  *    ONE oracle encoding of the IVF-PQ chain with q200 through
  *    [[PqOracle]].
  *
  *  - q203 z-order layout priced: bucket lineitem under the natural
  *    sort vs the Morton key ([[graft.operators.ZOrder]]) and read the
  *    per-bucket min/max ranges both ways — the statistics that drive
  *    file skipping. sf0.01 readout: natural (sum_xrange 271,
  *    sum_yrange 4096 — the second dimension gets NOTHING), z-order
  *    (1574, 1182 — both dimensions skip). Pure integer arithmetic,
  *    oracle replays the interleave bit-for-bit.
  *
  *
  *  - q202 grouped top-k via the salted two-phase reduction
  *    ([[graft.operators.GroupedTopK]]): per-(source, lang) top-3 docs
  *    by size — the `row_number() OVER (PARTITION BY low-card-key)`
  *    shape that single-tasks each group's whole extent at scale,
  *    re-expressed so phase 1 fans each group over salt cells and the
  *    per-group window only ever sees ≤ salts·k bounded survivors.
  *
  *
  *  - q201 OPQ-rotated PQ priced: recall@10 of flat PQ vs PQ over a
  *    deterministic orthonormal rotation (randomized-Hadamard HD/√d,
  *    [[graft.ext.VectorIndex.hadamardRotate]]) at the SAME code
  *    budget (m = 2 × k = 32), against the brute cosine top-10 —
  *    completing q200's pricing table with the rotation rung. The
  *    rotation matrix is exactly orthonormal and its entries are
  *    exact powers of two, so the whole rotate→train→encode→search
  *    chain unrolls into SQL bit-for-bit (the q88 doctrine). On the
  *    gate corpus (near-isotropic unit vectors, measured 4×
  *    covariance eigenspread) rotation is distribution-neutral; the
  *    row prices that honestly — the rung's value shows on
  *    anisotropic/correlated embedding families, and the point of the
  *    query is that the price is READ, not assumed.
  */
object Extended20 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** THE dimension both sides of q201 encode — the Spark path asserts
    * the fixture matches it, and every hard number in [[q201Sql]]
    * (subspace width, generate_series bounds, the 1/√d scale, the sign
    * vector length) derives from it, so a fixture dim change fails
    * LOUDLY here instead of silently diverging the oracle. Power of 2
    * (Hadamard) and divisible by m = 2 (the PQ budget). */
  private[queries] val RotDim = 64
  private val RotScale = 1.0 / math.sqrt(RotDim.toDouble)

  /** q205's nested-prefix widths, ascending; the last is the full
    * dimension (its row is the identity sanity rung). Every width in
    * the oracle's list_slice calls derives from this one list. */
  private[graft] val MatryoshkaDims: Seq[Int] =
    Seq(RotDim / 8, RotDim / 4, RotDim / 2, RotDim)

  // --------------------------------------------------------------------
  // q201 — the OPQ rotation rung priced at equal code budget.
  def q201(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    def bp(c: Column) = floor(c * 10000.0 + 0.5).cast("long")
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val exact = e.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id".as("id"),
        bp(graft.functions.VectorFns.cosine($"embedding", $"qvec"))
          .as("score"))
      .orderBy($"score".desc, $"id".asc).limit(10)
    val qRow = e.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0)
    require(qRow.length == RotDim,
      s"q201 oracle is encoded for dim $RotDim; embeddings fixture has " +
        s"dim ${qRow.length} — update Extended20.RotDim (both sides " +
        "derive from it)")
    // flat PQ baseline at the q200 budget (m = 2, k = 32, 2 Lloyd)
    val cb = graft.ext.VectorIndex
      .pqTrain(e, "embedding", "vec_id", m = 2, k = 32, iterations = 2)
    val pqApprox = graft.ext.VectorIndex
      .pqSearch(graft.ext.VectorIndex
          .pqEncode(e.filter($"vec_id" =!= 0), "embedding", "vec_id", cb),
        "vec_id", cb, qRow.map(_.toDouble).toArray, k = 10)
      .select($"vec_id".as("id"), (-$"adist_micro").as("score"))
    // OPQ: exactly-orthonormal deterministic rotation, SAME budget.
    // The rotated query comes from the SAME Spark expression (1-row
    // collect), so driver and corpus arithmetic are identical.
    // PINNED (q197's discipline): the rotation is O(d²) multiply-adds
    // per row and the PQ chain scans it ~8 times (per-subspace init +
    // Lloyd passes, encode, search) — unpinned, every scan recomputes
    // the projection and the rotation dominates the whole query.
    val rot = graft.ext.VectorIndex
      .hadamardRotate(e, "embedding", "rvec", seed = "opq")
      .select($"vec_id", $"rvec")
      .localCheckpoint()
    val rcb = graft.ext.VectorIndex
      .pqTrain(rot, "rvec", "vec_id", m = 2, k = 32, iterations = 2)
    val rq = rot.filter($"vec_id" === 0)
      .select($"rvec").head().getSeq[Double](0).toArray
    val opqApprox = graft.ext.VectorIndex
      .pqSearch(graft.ext.VectorIndex
          .pqEncode(rot.filter($"vec_id" =!= 0), "rvec", "vec_id", rcb),
        "vec_id", rcb, rq, k = 10)
      .select($"vec_id".as("id"), (-$"adist_micro").as("score"))
    def price(name: String, approx: DataFrame): DataFrame =
      graft.ext.Retrieval.recallAtK(approx, exact, "id", "score", k = 10)
        .select(lit(name).as("method"), $"n_common", $"recall_ppm")
    price("pq_flat", pqApprox)
      .unionByName(price("opq_pq", opqApprox))
      .orderBy($"method")
  }

  val q201Sql: String = {
    val dsub = RotDim / 2
    def cos(a: String, b: String) =
      s"""list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2]))
         |   / (sqrt(list_sum(list_transform($a, x -> x * x)))
         |      * sqrt(list_sum(list_transform($b, x -> x * x))))""".stripMargin
    def l2(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), x -> (x[1] - x[2]) * (x[1] - x[2])))"
    // one Lloyd pass of the per-subspace L2 k-means (q200's exact CTE
    // shape), parameterized by chain prefix so the raw and rotated
    // chains share the text
    def lloyd(p: String, j: Int, i: Int) =
      s""" ${p}s$j$i AS (SELECT sub.vec_id, c.cell, ${l2("sub.v", "c.c")} AS d2
         |          FROM ${p}sub$j sub CROSS JOIN ${p}c$j$i c),
         | ${p}a$j$i AS (SELECT vec_id, cell FROM (
         |           SELECT vec_id, cell, row_number() OVER (
         |             PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
         |           FROM ${p}s$j$i) WHERE rn = 1),
         | ${p}m$j$i AS (SELECT cell, list(x ORDER BY i) AS c FROM (
         |           SELECT a.cell, u.i,
         |                  CAST(CAST(sum(u.x) / count(*) AS REAL) AS DOUBLE) AS x
         |           FROM ${p}a$j$i a JOIN (SELECT vec_id, unnest(v) AS x,
         |                     unnest(generate_series(1, len(v))) AS i FROM ${p}sub$j) u
         |             USING (vec_id)
         |           GROUP BY a.cell, u.i) GROUP BY cell),
         | ${p}c$j${i + 1} AS (SELECT c.cell, coalesce(m.c, c.c) AS c
         |               FROM ${p}c$j$i c LEFT JOIN ${p}m$j$i m USING (cell))""".stripMargin
    // full flat-PQ chain (train ×2 Lloyd, assign, query LUT) over
    // source CTE `src` with query CTE `qcte`, names prefixed `p`
    def pqChain(p: String, src: String, qcte: String) = (0 until 2).map { j =>
      val lo = j * dsub + 1; val hi = (j + 1) * dsub
      s""" ${p}sub$j AS (SELECT vec_id, list_slice(v, $lo, $hi) AS v FROM $src),
         | ${p}c${j}0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
         |                 AS INTEGER) AS cell, v AS c
         |        FROM (SELECT vec_id, v FROM ${p}sub$j ORDER BY vec_id LIMIT 32)),
         |${lloyd(p, j, 0)},
         |${lloyd(p, j, 1)},
         | ${p}sf$j AS (SELECT sub.vec_id, c.cell, ${l2("sub.v", "c.c")} AS d2
         |          FROM ${p}sub$j sub CROSS JOIN ${p}c${j}2 c),
         | ${p}af$j AS (SELECT vec_id, cell FROM (
         |           SELECT vec_id, cell, row_number() OVER (
         |             PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
         |           FROM ${p}sf$j) WHERE rn = 1),
         | ${p}lut$j AS (SELECT c.cell,
         |             CAST(floor(${l2(s"list_slice($qcte.v, $lo, $hi)", "c.c")}
         |               * 1000000.0) AS BIGINT) AS d
         |           FROM ${p}c${j}2 c CROSS JOIN $qcte)""".stripMargin
    }.mkString(",\n")
    def top10(p: String) =
      s"""SELECT ${p}af0.vec_id AS id
         |   FROM ${p}af0 JOIN ${p}af1 USING (vec_id)
         |        JOIN ${p}lut0 l0 ON l0.cell = ${p}af0.cell
         |        JOIN ${p}lut1 l1 ON l1.cell = ${p}af1.cell
         |   WHERE ${p}af0.vec_id <> 0
         |   ORDER BY l0.d + l1.d, ${p}af0.vec_id LIMIT 10""".stripMargin
    // the rotation: y[j] = Σ_i v[i]·coef(j,i), coef = ±1/8 exactly
    // (Hadamard sign via bit_count parity × the MD5-drawn diagonal)
    val sLit = graft.ext.VectorIndex.signMatrix(1, RotDim, "opq")(0)
      .mkString("[", ", ", "]")
    // Double.toString round-trips exactly; for RotDim = 64 it is the
    // exact binary value 0.125
    val scaleLit = RotScale.toString
    val dimM1 = RotDim - 1
    s"""WITH e AS (SELECT vec_id,
       |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |        FROM embeddings),
       | q AS (SELECT v FROM e WHERE vec_id = 0),
       | exact AS (SELECT e.vec_id AS id,
       |     CAST(floor(${cos("e.v", "q.v")} * 10000.0 + 0.5) AS BIGINT)
       |       AS score
       |   FROM e CROSS JOIN q WHERE e.vec_id <> 0
       |   ORDER BY score DESC, id LIMIT 10),
       | rot AS (SELECT vec_id,
       |     list_transform(generate_series(0, $dimM1), j ->
       |       list_sum(list_transform(generate_series(0, $dimM1), i ->
       |         v[i + 1] * (CAST(
       |           (1 - 2 * (bit_count(j & i) % 2)) * ($sLit)[i + 1]
       |           AS DOUBLE) * $scaleLit)))) AS v
       |   FROM e),
       | rq AS (SELECT v FROM rot WHERE vec_id = 0),
       |${pqChain("f", "e", "q")},
       |${pqChain("r", "rot", "rq")},
       | pq10 AS (${top10("f")}),
       | opq10 AS (${top10("r")}),
       | nex AS (SELECT CAST(count(*) AS BIGINT) AS n FROM exact)
       |SELECT method, n_common,
       |       CAST(n_common * 1000000 // (SELECT n FROM nex) AS BIGINT)
       |         AS recall_ppm
       |FROM (
       |  SELECT 'opq_pq' AS method,
       |    CAST((SELECT count(*) FROM exact JOIN opq10 USING (id))
       |      AS BIGINT) AS n_common
       |  UNION ALL SELECT 'pq_flat',
       |    CAST((SELECT count(*) FROM exact JOIN pq10 USING (id)) AS BIGINT))
       |ORDER BY method""".stripMargin
  }

  // --------------------------------------------------------------------
  // q202 — salted grouped top-k (the scalable PARTITION BY-low-card
  // window form): per (source, lang) the 3 largest docs.
  def q202(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.GroupedTopK
      .topK(t(s, dir, "documents").select($"source", $"lang", $"doc_id",
          $"n_chars".cast("long").as("n_chars")),
        Seq("source", "lang"), Seq($"n_chars".desc, $"doc_id".asc), k = 3)
      .orderBy($"source", $"lang", $"rk")
  }

  val q202Sql: String =
    """SELECT source, lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
      |       rk
      |FROM (SELECT source, lang, doc_id, n_chars,
      |             CAST(row_number() OVER (PARTITION BY source, lang
      |               ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rk
      |      FROM documents)
      |WHERE rk <= 3
      |ORDER BY source, lang, rk""".stripMargin

  // --------------------------------------------------------------------
  // q203 — z-order layout priced against the natural sort order: bucket
  // lineitem 16 ways under each layout and read the per-bucket min/max
  // ranges on BOTH z-dimensions (the statistics file-skipping prunes
  // with). Natural order gives the leading key tight ranges and the
  // second key nothing; the Morton key balances both — the sum of
  // y-ranges is the honest number (how much a predicate on the SECOND
  // column can skip). All integer arithmetic end to end.
  private val ZBits = 8
  private val ZBuckets = 16

  def q203(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey")
    val mx = li.agg(max($"l_orderkey").as("mo"), max($"l_partkey").as("mp"))
    val dim = 1L << ZBits
    val q = li.crossJoin(broadcast(mx)).select(
      $"l_orderkey", $"l_linenumber",
      expr(s"l_orderkey * $dim div (mo + 1)").as("x"),
      expr(s"l_partkey * $dim div (mp + 1)").as("y"))
    // PINNED: both readouts drive ~3 actions each over this frame
    // (range-sampling, zip-size, withNtile's count) — unpinned, the
    // scan + max-join + quantization re-run ~6× (the q201 lesson)
    val z = q.withColumn("z",
        graft.operators.ZOrder.zvalue(Seq($"x", $"y"), ZBits))
      .localCheckpoint()
    def readout(sortCols: Seq[Column], layout: String): DataFrame =
      graft.operators.GlobalRank
        .withNtile(z, sortCols, ZBuckets, "b")
        .groupBy($"b")
        .agg((max($"x") - min($"x") + 1L).as("xr"),
          (max($"y") - min($"y") + 1L).as("yr"))
        .agg(sum($"xr").cast("long").as("sum_xrange"),
          sum($"yr").cast("long").as("sum_yrange"),
          sum($"xr" * $"yr").cast("long").as("sum_area"))
        .select(lit(layout).as("layout"),
          $"sum_xrange", $"sum_yrange", $"sum_area")
    readout(Seq($"l_orderkey", $"l_linenumber"), "natural")
      .unionByName(
        readout(Seq($"z", $"l_orderkey", $"l_linenumber"), "zorder"))
      .orderBy($"layout")
  }

  val q203Sql: String = {
    val dim = 1L << ZBits
    val zExpr = graft.operators.ZOrder.zvalueSql(Seq("x", "y"), ZBits)
    def readout(order: String, layout: String) =
      s"""SELECT '$layout' AS layout,
         |       CAST(sum(xr) AS BIGINT) AS sum_xrange,
         |       CAST(sum(yr) AS BIGINT) AS sum_yrange,
         |       CAST(sum(xr * yr) AS BIGINT) AS sum_area
         |FROM (SELECT b, max(x) - min(x) + 1 AS xr,
         |             max(y) - min(y) + 1 AS yr
         |      FROM (SELECT x, y, ntile($ZBuckets) OVER (ORDER BY $order) AS b
         |            FROM z)
         |      GROUP BY b)""".stripMargin
    s"""WITH q AS (SELECT l_orderkey, l_linenumber,
       |        l_orderkey * $dim // (mo + 1) AS x,
       |        l_partkey * $dim // (mp + 1) AS y
       |      FROM lineitem CROSS JOIN (SELECT max(l_orderkey) AS mo,
       |        max(l_partkey) AS mp FROM lineitem)),
       | z AS (SELECT l_orderkey, l_linenumber, x, y, $zExpr AS z FROM q)
       |${readout("l_orderkey, l_linenumber", "natural")}
       |UNION ALL
       |${readout("z, l_orderkey, l_linenumber", "zorder")}
       |ORDER BY layout""".stripMargin
  }

  // --------------------------------------------------------------------
  // q204 — the refine rung: exact re-rank of the IVF-PQ ADC shortlist.
  // Same index, same probe set as q200's ivf_pq row; the ONLY new cost
  // is R = 30 raw-vector reads (a broadcast semi-join against the
  // corpus), and the row pair prices what that buys: recall@10 of the
  // direct ADC top-10 vs the refined R→10 read-out. Refined recall is
  // bounded above by the probed-cells ceiling — quantization error is
  // recoverable, an unprobed cell is not — and the spec pins both
  // inequalities (refine ≥ adc, refine ≤ probed-exact).
  def q204(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    def bp(c: Column) = floor(c * 10000.0 + 0.5).cast("long")
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val exact = e.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id".as("id"),
        bp(graft.functions.VectorFns.cosine($"embedding", $"qvec"))
          .as("score"))
      .orderBy($"score".desc, $"id".asc).limit(10)
    val qRow = e.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).toArray
    val idx = graft.ext.VectorIndex.ivfPqBuild(e, "embedding", "vec_id",
      kCoarse = 8, coarseIters = 1, m = 2, kSub = 32, pqIters = 1)
    def adc(kk: Int): DataFrame = graft.ext.VectorIndex
      .ivfPqSearch(idx.codes.filter($"vec_id" =!= 0), "vec_id", idx,
        qRow, k = kk, nProbe = 3)
    val direct = adc(10)
      .select($"vec_id".as("id"), (-$"adist_micro").as("score"))
    val refined = graft.ext.VectorIndex
      .refineExact(adc(30), e.filter($"vec_id" =!= 0),
        "embedding", "vec_id", qRow, k = 10)
      .select($"vec_id".as("id"), $"score_bp".as("score"))
    def price(name: String, approx: DataFrame): DataFrame =
      graft.ext.Retrieval.recallAtK(approx, exact, "id", "score", k = 10)
        .select(lit(name).as("method"), $"n_common", $"recall_ppm")
    price("ivf_pq_adc", direct)
      .unionByName(price("ivf_pq_refine", refined))
      .orderBy($"method")
  }

  val q204Sql: String = {
    import PqOracle.cos
    s"""WITH ${PqOracle.eq},
       | ${PqOracle.exact10},
       |${PqOracle.ivfChain()},
       |${PqOracle.adcTop("adc10", 10)},
       |${PqOracle.adcTop("short30", 30)},
       | refined AS (SELECT id, score FROM (
       |     SELECT s.id,
       |       CAST(floor(${cos("e.v", "q.v")} * 10000.0 + 0.5) AS BIGINT)
       |         AS score
       |     FROM short30 s JOIN e ON e.vec_id = s.id CROSS JOIN q)
       |   ORDER BY score DESC, id LIMIT 10),
       | nex AS (SELECT CAST(count(*) AS BIGINT) AS n FROM exact)
       |SELECT method, n_common,
       |       CAST(n_common * 1000000 // (SELECT n FROM nex) AS BIGINT)
       |         AS recall_ppm
       |FROM (
       |  SELECT 'ivf_pq_adc' AS method,
       |    CAST((SELECT count(*) FROM exact JOIN adc10 USING (id))
       |      AS BIGINT) AS n_common
       |  UNION ALL SELECT 'ivf_pq_refine',
       |    CAST((SELECT count(*) FROM exact JOIN refined USING (id))
       |      AS BIGINT))
       |ORDER BY method""".stripMargin
  }

  // --------------------------------------------------------------------
  // q205 — Matryoshka head-dims pricing (Kusupati et al., NeurIPS
  // 2022): score with only the first d components of the stored
  // vectors (MRL's nested-prefix read-out — at serving time the tail
  // of every vector is simply not read, shrinking scan bytes and
  // distance FLOPs by 64/d) and price recall@10 at each prefix against
  // the full-dim brute-force top-10. The d = 64 row is the identity
  // sanity rung (recall 1.0 by construction). On THIS fixture the
  // embeddings are near-isotropic — no MRL training concentrated
  // information in the head — so the table reads as the honest
  // worst-case price of truncation, same doctrine as q201's
  // distribution-neutral rotation row.
  def q205(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    def bp(c: Column) = floor(c * 10000.0 + 0.5).cast("long")
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val dlen = e.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).length
    require(dlen == RotDim,
      s"q205 oracle is encoded for dim $RotDim; embeddings fixture has " +
        s"dim $dlen — update Extended20.RotDim (both sides derive " +
        "from it)")
    def scoredAt(d: Int): DataFrame =
      e.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
        .select($"vec_id".as("id"),
          bp(graft.functions.VectorFns.cosine(
            slice($"embedding", 1, d), slice($"qvec", 1, d))).as("score"))
    val exact = scoredAt(RotDim).orderBy($"score".desc, $"id".asc).limit(10)
    MatryoshkaDims.map { d =>
      graft.ext.Retrieval.recallAtK(scoredAt(d), exact, "id", "score",
          k = 10)
        .select(lit(d).as("dim"), $"n_common", $"recall_ppm")
    }.reduce(_ unionByName _).orderBy($"dim")
  }

  val q205Sql: String = {
    import PqOracle.cos
    val scored = MatryoshkaDims.map { d =>
      s""" sc$d AS (SELECT e.vec_id AS id,
         |     CAST(floor(${cos(s"list_slice(e.v, 1, $d)",
                                s"list_slice(q.v, 1, $d)")}
         |       * 10000.0 + 0.5) AS BIGINT) AS score
         |   FROM e CROSS JOIN q WHERE e.vec_id <> 0)""".stripMargin
    }.mkString(",\n")
    val rows = MatryoshkaDims.map { d =>
      s"""  SELECT CAST($d AS INTEGER) AS dim,
         |    CAST((SELECT count(*) FROM ex JOIN top$d USING (id))
         |      AS BIGINT) AS n_common""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val tops = MatryoshkaDims.map { d =>
      s" top$d AS (SELECT id FROM sc$d ORDER BY score DESC, id LIMIT 10)"
    }.mkString(",\n")
    s"""WITH ${PqOracle.eq},
       |$scored,
       | ex AS (SELECT id FROM sc$RotDim ORDER BY score DESC, id LIMIT 10),
       |$tops
       |SELECT dim, n_common,
       |       CAST(n_common * 1000000 // 10 AS BIGINT) AS recall_ppm
       |FROM (
       |$rows)
       |ORDER BY dim""".stripMargin
  }

  // --------------------------------------------------------------------
  // q206 — the training-free rung: binary quantization (1 bit/dim sign
  // codes, Hamming distance) priced direct and with the q204 refine
  // pass over an R = 30 shortlist. No codebook anywhere, so unlike the
  // PQ rows this one's oracle needs no Lloyd unroll: the Hamming
  // distance is an integer on both engines (DuckDB sums sign
  // mismatches over the unpacked list; Spark XOR+popcounts the packed
  // code — identical by construction).
  def q206(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    def bp(c: Column) = floor(c * 10000.0 + 0.5).cast("long")
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val exact = e.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id".as("id"),
        bp(graft.functions.VectorFns.cosine($"embedding", $"qvec"))
          .as("score"))
      .orderBy($"score".desc, $"id".asc).limit(10)
    val qRow = e.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).toArray
    require(qRow.length == RotDim,
      s"q206 oracle is encoded for dim $RotDim; embeddings fixture has " +
        s"dim ${qRow.length} — update Extended20.RotDim")
    val corpus = e.filter($"vec_id" =!= 0)
    def bq(kk: Int): DataFrame = graft.ext.VectorIndex
      .binarySearch(corpus, "embedding", "vec_id", qRow, k = kk,
        bits = RotDim)
    val direct = bq(10)
      .select($"vec_id".as("id"), (-$"hamming").as("score"))
    val refined = graft.ext.VectorIndex
      .refineExact(bq(30), corpus, "embedding", "vec_id", qRow, k = 10)
      .select($"vec_id".as("id"), $"score_bp".as("score"))
    def price(name: String, approx: DataFrame): DataFrame =
      graft.ext.Retrieval.recallAtK(approx, exact, "id", "score", k = 10)
        .select(lit(name).as("method"), $"n_common", $"recall_ppm")
    price("bq_hamming", direct)
      .unionByName(price("bq_refine", refined))
      .orderBy($"method")
  }

  val q206Sql: String = {
    import PqOracle.cos
    s"""WITH ${PqOracle.eq},
       | ${PqOracle.exact10},
       | ham AS (SELECT e.vec_id AS id,
       |     CAST(list_sum(list_transform(list_zip(e.v, q.v),
       |       x -> CASE WHEN (x[1] >= 0) <> (x[2] >= 0)
       |            THEN 1 ELSE 0 END)) AS BIGINT) AS h
       |   FROM e CROSS JOIN q WHERE e.vec_id <> 0),
       | bq10 AS (SELECT id FROM ham ORDER BY h ASC, id ASC LIMIT 10),
       | short30 AS (SELECT id FROM ham ORDER BY h ASC, id ASC LIMIT 30),
       | refined AS (SELECT id FROM (
       |     SELECT s.id,
       |       CAST(floor(${cos("e.v", "q.v")} * 10000.0 + 0.5) AS BIGINT)
       |         AS score
       |     FROM short30 s JOIN e ON e.vec_id = s.id CROSS JOIN q)
       |   ORDER BY score DESC, id LIMIT 10),
       | nex AS (SELECT CAST(count(*) AS BIGINT) AS n FROM exact)
       |SELECT method, n_common,
       |       CAST(n_common * 1000000 // (SELECT n FROM nex) AS BIGINT)
       |         AS recall_ppm
       |FROM (
       |  SELECT 'bq_hamming' AS method,
       |    CAST((SELECT count(*) FROM exact JOIN bq10 USING (id))
       |      AS BIGINT) AS n_common
       |  UNION ALL SELECT 'bq_refine',
       |    CAST((SELECT count(*) FROM exact JOIN refined USING (id))
       |      AS BIGINT))
       |ORDER BY method""".stripMargin
  }

  // --------------------------------------------------------------------
  // q207 — stratified exact-count split: per-source val/test holdouts
  // with GUARANTEED allocations (rank ≤ n·cum_ppm div 10⁶ within each
  // source), ranked by an engine-portable multiplicative-hash
  // pseudo-shuffle. Doc-level assignment is the gate output — every
  // one of the 500 rows' split label must replay exactly in DuckDB's
  // windowed form, while the Spark side ranks through the keyed
  // two-pass prefix sums (no per-source single-task sort; the spec
  // asserts the plan is window-free).
  def q207(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents").select($"doc_id", $"source")
    val shuffleKey = (($"doc_id" % 1048576L) * 2654435761L) % 4294967296L
    graft.ext.TrainPrep.stratifiedSplit(d, Seq("source"),
      Seq(shuffleKey, $"doc_id"),
      Seq("val" -> 100000L, "test" -> 200000L))
  }

  val q207Sql: String =
    """WITH r AS (SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY ((doc_id % 1048576) * 2654435761) % 4294967296,
      |               doc_id) AS rn,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM documents)
      |SELECT doc_id, source,
      |  CASE WHEN rn <= n * 100000 // 1000000 THEN 'val'
      |       WHEN rn <= n * 300000 // 1000000 THEN 'test'
      |       ELSE 'train' END AS split
      |FROM r""".stripMargin

  // --------------------------------------------------------------------
  // q208 — TextRank keywords (Mihalcea & Tarau 2004): PageRank over
  // the adjacent-token co-occurrence graph with token strings as node
  // ids, 3 supersteps in the q134 integer-ppt arithmetic. Centrality,
  // not frequency: the read-out ranks tokens by how connected their
  // neighborhoods are, which a count(*) top-k cannot reproduce.
  def q208(s: SparkSession, dir: String): DataFrame =
    graft.ext.Profile.textRankKeywords(
      t(s, dir, "documents"), "text", iterations = 3, k = 15)

  val q208Sql: String = {
    // q134's superstep in ppt integer arithmetic, over string nodes
    def step(prev: String, cur: String): String =
      s""" acc_$cur AS (
         |  SELECT e.dst AS node, CAST(sum(p.r // dg.d) AS BIGINT) AS acc
         |  FROM e JOIN $prev p ON p.node = e.src JOIN deg dg ON dg.node = e.src
         |  GROUP BY e.dst),
         | $cur AS (
         |  SELECT d.node,
         |    CAST(150000000000 // cnt
         |         + (85 * coalesce(a.acc, 0)) // 100 AS BIGINT) AS r
         |  FROM deg d CROSS JOIN n LEFT JOIN acc_$cur a ON a.node = d.node)"""
        .stripMargin
    s"""WITH tk AS (SELECT ${DocOps.tokensSql} AS ts FROM documents),
       | pr AS (SELECT ts[i.i] AS a, ts[i.i + 1] AS b
       |        FROM tk, unnest(generate_series(1, len(ts) - 1)) AS i(i)),
       | und AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
       |         FROM pr WHERE a <> b),
       | e AS (SELECT a AS src, b AS dst FROM und
       |       UNION ALL SELECT b AS src, a AS dst FROM und),
       | deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),
       | n AS (SELECT count(*) AS cnt FROM deg),
       | r0 AS (SELECT node, CAST(1000000000000 // cnt AS BIGINT) AS r
       |        FROM deg CROSS JOIN n),
       |${step("r0", "r1")},
       |${step("r1", "r2")},
       |${step("r2", "r3")}
       |SELECT node AS word, r AS rank_ppt
       |FROM r3 ORDER BY rank_ppt DESC, word LIMIT 15""".stripMargin
  }

  // --------------------------------------------------------------------
  // q209 — incremental IVF-PQ append: build on the FIRST HALF of the
  // corpus (vec_id < 250 trains coarse centroids and codebook), append
  // the second half with the codebooks FROZEN
  // ([[graft.ext.VectorIndex.ivfPqAppend]] — one encode scan of the
  // new rows, the FAISS `add` contract), then probe the grown index.
  // The gate replays the whole lifecycle: the oracle trains its chain
  // under the same vec_id < 250 predicate and encodes everything, so
  // any drift between "append" and "encode under frozen training"
  // breaks the hash. Search ids landing ABOVE 250 prove the probe
  // reads appended rows (the spec asserts it).
  def q209(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    val old = e.filter($"vec_id" < 250)
    val fresh = e.filter($"vec_id" >= 250)
    val qRow = e.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).toArray
    val idx = graft.ext.VectorIndex.ivfPqBuild(old, "embedding", "vec_id",
      kCoarse = 8, coarseIters = 1, m = 2, kSub = 32, pqIters = 1)
    val grown = graft.ext.VectorIndex
      .ivfPqAppend(idx, fresh, "embedding", "vec_id")
    graft.ext.VectorIndex
      .ivfPqSearch(grown.codes.filter($"vec_id" =!= 0), "vec_id", grown,
        qRow, k = 10, nProbe = 3)
      .select($"vec_id".as("id"), $"cell", $"adist_micro")
  }

  val q209Sql: String =
    s"""WITH ${PqOracle.eq},
       |${PqOracle.ivfChain("vec_id < 250")}
       |SELECT r.vec_id AS id, r.cell,
       |       CAST(l0.d + l1.d AS BIGINT) AS adist_micro
       |FROM res r JOIN p0af USING (vec_id) JOIN p1af f1
       |       ON f1.vec_id = r.vec_id
       |     JOIN plut0 l0 ON l0.cell = r.cell AND l0.pqcell = p0af.cell
       |     JOIN plut1 l1 ON l1.cell = r.cell AND l1.pqcell = f1.cell
       |WHERE r.vec_id <> 0 AND r.cell IN (SELECT cell FROM pr)
       |ORDER BY adist_micro, r.vec_id LIMIT 10""".stripMargin

  // --------------------------------------------------------------------
  // q210 — per-source corpus datasheet: the dataset-card summary row
  // (doc/char totals, integer mean, short-doc + exact-dup ppm rates,
  // language spread, majority language) in two map-side-combinable
  // aggregations. Everything integer-exact; dups detected on
  // md5(text) identically in both engines.
  def q210(s: SparkSession, dir: String): DataFrame =
    graft.ext.Profile
      .datasheet(t(s, dir, "documents"), "source", "text", "lang")
      .orderBy(col("source"))

  val q210Sql: String =
    """WITH b AS (SELECT source, count(*) AS n_docs,
      |    sum(length(text)) AS sum_chars,
      |    sum(CASE WHEN length(text) < 100 THEN 1 ELSE 0 END) AS sh,
      |    count(DISTINCT md5(text)) AS uniq,
      |    count(DISTINCT lang) AS n_langs
      |  FROM documents GROUP BY source),
      | lc AS (SELECT source, lang, count(*) AS c
      |        FROM documents GROUP BY source, lang),
      | tl AS (SELECT source, lang AS top_lang FROM (
      |    SELECT source, lang, row_number() OVER (PARTITION BY source
      |      ORDER BY c DESC, lang DESC) AS rn FROM lc) WHERE rn = 1)
      |SELECT b.source, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(sum_chars AS BIGINT) AS sum_chars,
      |  CAST(sum_chars // n_docs AS BIGINT) AS mean_chars,
      |  CAST(sh * 1000000 // n_docs AS BIGINT) AS short_ppm,
      |  CAST((n_docs - uniq) * 1000000 // n_docs AS BIGINT) AS dup_ppm,
      |  CAST(n_langs AS BIGINT) AS n_langs, top_lang
      |FROM b JOIN tl ON tl.source = b.source
      |ORDER BY b.source""".stripMargin

  /** Name → query function, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q201_opq_recall" -> (q201 _),
    "q202_grouped_topk" -> (q202 _),
    "q203_zorder_layout" -> (q203 _),
    "q204_refine_rung" -> (q204 _),
    "q205_matryoshka" -> (q205 _),
    "q206_binary_rung" -> (q206 _),
    "q207_stratified_split" -> (q207 _),
    "q208_textrank" -> (q208 _),
    "q209_ivfpq_append" -> (q209 _),
    "q210_datasheet" -> (q210 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q201_opq_recall" -> q201Sql,
    "q202_grouped_topk" -> q202Sql,
    "q203_zorder_layout" -> q203Sql,
    "q204_refine_rung" -> q204Sql,
    "q205_matryoshka" -> q205Sql,
    "q206_binary_rung" -> q206Sql,
    "q207_stratified_split" -> q207Sql,
    "q208_textrank" -> q208Sql,
    "q209_ivfpq_append" -> q209Sql,
    "q210_datasheet" -> q210Sql
  )
}
