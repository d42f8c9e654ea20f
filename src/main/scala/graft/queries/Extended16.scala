package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 batch (q170–q172) — classifier-eval and corpus-profiling
  * stages a training-data pipeline runs beside AUC (q158):
  *
  *  - q170 calibration bins + expected calibration error (is the
  *    quality classifier's score a probability, or just a ranking?);
  *  - q171 exact average precision / P@k (the retrieval-side metric
  *    for the same classifier — rank-sensitive where AUC is not);
  *  - q172 vocabulary growth (Heaps-law curve) + Chao1 richness (how
  *    much unseen vocabulary remains — a dedup/coverage planning
  *    signal).
  *
  * All three are integer-exact: ppm/micro floor arithmetic over exact
  * counts, so no float partial-sum order can flip a gate digit at any
  * partitioning (the q88/q158 doctrine).
  */
object Extended16 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------------
  // q170 — calibration bins + ECE: treat conf = n_chars/max(n_chars)
  // (in ppm) as the classifier's P(lang=en) and bin into deciles.
  // Per-bin |accuracy − confidence| never leaves integer space:
  // |acc_b − conf̄_b| · n_b  =  |n_pos_b·10⁶ − Σconf_b| / 10⁶, so
  // ECE_ppm = Σ_b |n_pos_b·10⁶ − Σconf_b| div N exactly.
  //
  // Scale: one map-side-combinable 10-group agg over the corpus; the
  // ECE fold-up runs on the 10-row bin frame (broadcast back). The
  // max(n_chars) scalar is a broadcast, not a collect-into-loop.
  def q170(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
    val mx = d.agg(max($"n_chars").as("mx"))
    val bins = d.crossJoin(broadcast(mx))
      .select(
        expr("n_chars * 1000000 div mx").as("conf_ppm"),
        when($"lang" === "en", 1L).otherwise(0L).as("pos"))
      .select(least(expr("conf_ppm div 100000"), lit(9L)).as("bin"),
        $"conf_ppm", $"pos")
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum($"pos").as("n_pos"),
        sum($"conf_ppm").as("sum_conf_ppm"))
      .withColumn("gap_abs", abs($"n_pos" * 1000000L - $"sum_conf_ppm"))
    val ece = bins.agg(
      expr("sum(gap_abs) div sum(n)").as("ece_ppm"))
    bins.crossJoin(broadcast(ece))
      .select($"bin", $"n", $"n_pos", $"sum_conf_ppm", $"gap_abs",
        $"ece_ppm")
      .orderBy($"bin")
  }

  val q170Sql: String =
    """WITH mx AS (SELECT max(n_chars) AS mx FROM documents),
      | conf AS (SELECT n_chars * 1000000 // mx AS conf_ppm,
      |        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |        FROM documents, mx),
      | bins AS (SELECT LEAST(conf_ppm // 100000, 9) AS bin,
      |        count(*) AS n,
      |        CAST(SUM(pos) AS BIGINT) AS n_pos,
      |        CAST(SUM(conf_ppm) AS BIGINT) AS sum_conf_ppm
      |        FROM conf GROUP BY 1),
      | tot AS (SELECT CAST(SUM(ABS(n_pos * 1000000 - sum_conf_ppm))
      |          // SUM(n) AS BIGINT) AS ece_ppm FROM bins)
      |SELECT CAST(bin AS BIGINT) AS bin, n, n_pos, sum_conf_ppm,
      |       CAST(ABS(n_pos * 1000000 - sum_conf_ppm) AS BIGINT)
      |         AS gap_abs,
      |       ece_ppm
      |FROM bins, tot ORDER BY bin""".stripMargin

  // --------------------------------------------------------------------
  // q171 — exact average precision + P@100 for the same ranking
  // (score = n_chars, relevant = lang 'en'), ordered (score DESC,
  // doc_id ASC) — a total order, so every rank statistic is
  // deterministic. AP needs tp_k at every relevant rank k; both the
  // global rank and the exclusive prefix sum of rel come from ONE
  // GlobalRank.withRankAndPrefixSum pass (range-partition + two
  // bounded passes — NEVER an unpartitioned window; the q158 rule).
  // Contribution per relevant doc = (tp_before+1)·10⁶ div k — the
  // micro-precision at its own rank; AP_ppm = their sum div n_pos.
  // Integer headroom: (tp+1)·10⁶ caps at ~9·10¹² relevant docs —
  // two orders past a 10¹¹-doc / 100 TB corpus.
  def q171(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "documents")
      .select($"doc_id", $"n_chars".as("score"),
        when($"lang" === "en", 1L).otherwise(0L).as("rel"))
    graft.operators.GlobalRank
      .withRankAndPrefixSum(base, Seq($"score".desc, $"doc_id".asc),
        "rel", "k", "tp_before")
      .agg(
        count(lit(1)).as("n"),
        sum($"rel").as("n_pos"),
        sum(when($"rel" === 1L,
          expr("(tp_before + 1) * 1000000 div k"))).as("ap_sum_micro"),
        sum(when($"k" <= 100L, $"rel").otherwise(0L)).as("tp100"))
      .select($"n", $"n_pos",
        // n_pos = 0 (no relevant docs) must yield NULL identically in
        // both engines — DuckDB's `// 0` behavior varies by version
        // (the q149 divergence class), so guard rather than divide
        expr("case when n_pos > 0 then ap_sum_micro div n_pos end")
          .as("ap_ppm"),
        ($"tp100" * 10000L).as("p100_ppm"))
  }

  val q171Sql: String =
    """WITH r AS (SELECT doc_id, n_chars AS score,
      |        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel
      |        FROM documents),
      | o AS (SELECT rel,
      |        row_number() OVER (ORDER BY score DESC, doc_id ASC) AS k,
      |        COALESCE(SUM(rel) OVER (ORDER BY score DESC, doc_id ASC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |          AS tp_before
      |        FROM r)
      |SELECT count(*) AS n,
      |       CAST(SUM(rel) AS BIGINT) AS n_pos,
      |       CAST(CASE WHEN SUM(rel) > 0 THEN
      |              SUM(CASE WHEN rel = 1
      |                  THEN (tp_before + 1) * 1000000 // k END)
      |              // SUM(rel) END AS BIGINT) AS ap_ppm,
      |       CAST(SUM(CASE WHEN k <= 100 THEN rel ELSE 0 END) * 10000
      |            AS BIGINT) AS p100_ppm
      |FROM o""".stripMargin

  // --------------------------------------------------------------------
  // q172 — vocabulary growth (Heaps-law curve) + Chao1 richness: split
  // the corpus into 10 doc-id deciles; per decile, tokens ingested and
  // NEW types (tokens whose first occurrence lands there), plus the
  // cumulative curve — (cum_tokens, cum_types) pairs are the Heaps
  // plot. Chao1 (bias-corrected, V + f1(f1−1)/(2(f2+1)) in micro
  // units) estimates total vocabulary including the unseen tail from
  // the singleton/doubleton counts — all exact integers.
  //
  // Scale: one (token → min bucket, count) hash agg over the exploded
  // corpus; everything after runs on the 10-row bucket frame and the
  // 3-scalar richness frame. The cumsum window orders a BOUNDED
  // 10-value domain (the q139/q140 class — documented, never a
  // row-count-sized orderBy). First-bucket = bucket(min doc_id)
  // because the bucket function is monotone in doc_id.
  def q172(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
    val mx = d.agg(max($"doc_id").as("mx"))
    val tok = d.crossJoin(broadcast(mx))
      .select(expr("doc_id * 10 div (mx + 1)").as("bucket"),
        explode(split(trim($"text"), "\\s+")).as("token"))
    val perTok = tok.groupBy($"token")
      .agg(min($"bucket").as("fb"), count(lit(1)).as("cf"))
    val newTypes = perTok.groupBy($"fb".as("bucket"))
      .agg(count(lit(1)).as("new_types"))
    val bucketTokens = tok.groupBy($"bucket")
      .agg(count(lit(1)).as("bucket_tokens"))
    val rich = perTok.agg(
      count(lit(1)).as("v_total"),
      sum(when($"cf" === 1L, 1L).otherwise(0L)).as("f1"),
      sum(when($"cf" === 2L, 1L).otherwise(0L)).as("f2"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    bucketTokens
      .join(newTypes, Seq("bucket"), "left")
      .na.fill(0L, Seq("new_types"))
      .crossJoin(broadcast(rich))
      .select($"bucket", $"new_types",
        sum($"new_types").over(w).as("cum_types"),
        $"bucket_tokens",
        sum($"bucket_tokens").over(w).as("cum_tokens"),
        $"v_total",
        // identity (q*10⁶) div d == (q div d)*10⁶ + ((q mod d)*10⁶) div d
        // applied so the largest intermediate is f1² (not f1²·10⁶):
        // integer headroom runs to f1 ≈ 3·10⁹ singleton types instead
        // of 3·10⁶ — the difference between "overflows on a 100 TB
        // vocab" and "never does"
        expr("v_total * 1000000" +
          " + (f1 * (f1 - 1) div (2 * (f2 + 1))) * 1000000" +
          " + ((f1 * (f1 - 1)) % (2 * (f2 + 1))) * 1000000 div (2 * (f2 + 1))")
          .as("chao1_micro"))
      .orderBy($"bucket")
  }

  val q172Sql: String =
    """WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
      | tok AS (SELECT doc_id * 10 // (mx + 1) AS bucket,
      |        unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      |        FROM documents, mx),
      | per_tok AS (SELECT token, min(bucket) AS fb, count(*) AS cf
      |        FROM tok GROUP BY token),
      | nt AS (SELECT fb AS bucket, count(*) AS new_types
      |        FROM per_tok GROUP BY fb),
      | tb AS (SELECT bucket, count(*) AS bucket_tokens
      |        FROM tok GROUP BY bucket),
      | ch AS (SELECT count(*) AS v_total,
      |        SUM(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS f1,
      |        SUM(CASE WHEN cf = 2 THEN 1 ELSE 0 END) AS f2
      |        FROM per_tok),
      | g AS (SELECT tb.bucket, COALESCE(nt.new_types, 0) AS new_types,
      |        tb.bucket_tokens
      |        FROM tb LEFT JOIN nt USING (bucket))
      |SELECT bucket, CAST(new_types AS BIGINT) AS new_types,
      |       CAST(SUM(new_types) OVER (ORDER BY bucket) AS BIGINT)
      |         AS cum_types,
      |       CAST(bucket_tokens AS BIGINT) AS bucket_tokens,
      |       CAST(SUM(bucket_tokens) OVER (ORDER BY bucket) AS BIGINT)
      |         AS cum_tokens,
      |       CAST(v_total AS BIGINT) AS v_total,
      |       CAST(v_total * 1000000
      |            + (f1 * (f1 - 1) // (2 * (f2 + 1))) * 1000000
      |            + ((f1 * (f1 - 1)) % (2 * (f2 + 1))) * 1000000
      |              // (2 * (f2 + 1))
      |            AS BIGINT) AS chao1_micro
      |FROM g, ch ORDER BY bucket""".stripMargin

  // --------------------------------------------------------------------
  // q173 — pairwise source Jensen–Shannon divergence over unigram
  // distributions, in floor-scaled integer micro-nats (the q130 ln
  // doctrine): the "which sources are interchangeable / which are a
  // different register" matrix behind corpus-mixing decisions. For
  // sources with token counts a_t (total A) and b_t (total B):
  //   JS = 1/(2A)·Σ a_t ln(2·a_t·B / (a_t·B + b_t·A))
  //      + 1/(2B)·Σ b_t ln(2·b_t·A / (a_t·B + b_t·A))
  // — the a_t/A vs b_t/B mixture form with every ratio expressed over
  // integer cross-products, so the ONLY non-integer step is the ln,
  // floored at micro scale; zeros need no smoothing (a one-sided token
  // contributes exactly ln 2).
  //
  // Scale: one (source, token) agg, then one token-keyed agg packing
  // per-token counts into a source→cnt map (sources are a BOUNDED
  // domain), then a broadcast of the bounded pair grid — the corpus is
  // touched twice, the |S|²-fan-out happens on the token-distinct
  // frame only (the q169 bounded-grid doctrine pairwise). Every
  // product inside the ln (numerator AND denominator) is computed in
  // double space — a·B alone exceeds 2⁶³ near 10¹² tokens/source, so
  // the operands are cast BEFORE multiplying (relative precision is
  // all the ln needs; both engines compute the identical IEEE double,
  // so the floor digit can't diverge). The remaining bigint terms are
  // the sa/sb accumulators Σ a·floor(10⁶·ln …): |term| ≤ ~3·10⁷
  // micro-nats, so headroom runs to ~3·10¹¹ tokens per source before
  // 2⁶³ — fine at sf-scale, and at a true 100 TB run the fix is
  // milli-nat scaling, not wider integers.
  def q173(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = t(s, dir, "documents")
      .select($"source", explode(split(trim($"text"), "\\s+")).as("token"))
    val cnts = tok.groupBy($"source", $"token")
      .agg(count(lit(1)).as("cnt"))
    val totals = cnts.groupBy($"source").agg(sum($"cnt").as("tot"))
    val pairs = totals.as("l").join(totals.as("r"),
        $"l.source" < $"r.source")
      .select($"l.source".as("s1"), $"r.source".as("s2"),
        $"l.tot".as("at"), $"r.tot".as("bt"))
    val perTok = cnts.groupBy($"token")
      .agg(map_from_entries(collect_list(struct($"source", $"cnt")))
        .as("m"))
    perTok.crossJoin(broadcast(pairs))
      .select($"s1", $"s2", $"at", $"bt",
        coalesce(element_at($"m", $"s1"), lit(0L)).as("a"),
        coalesce(element_at($"m", $"s2"), lit(0L)).as("b"))
      .filter($"a" + $"b" > 0)
      .groupBy($"s1", $"s2", $"at", $"bt")
      .agg(
        sum(when($"a" > 0, $"a" * floor(lit(1000000.0) *
          log((lit(2.0) * $"a" * $"bt") /
            ($"a".cast("double") * $"bt" + $"b".cast("double") * $"at")))
          .cast("long")).otherwise(0L)).as("sa"),
        sum(when($"b" > 0, $"b" * floor(lit(1000000.0) *
          log((lit(2.0) * $"b" * $"at") /
            ($"a".cast("double") * $"bt" + $"b".cast("double") * $"at")))
          .cast("long")).otherwise(0L)).as("sb"),
        sum(when($"a" > 0 && $"b" > 0, 1L).otherwise(0L)).as("n_shared"),
        sum(when($"b" === 0, 1L).otherwise(0L)).as("n_only_1"),
        sum(when($"a" === 0, 1L).otherwise(0L)).as("n_only_2"))
      .select($"s1", $"s2",
        // each half approximates a KL term (≥ 0 exactly); the per-token
        // ln floors can push the SUM a hair negative for near-identical
        // sources, where Spark's truncating `div` and DuckDB's flooring
        // `//` disagree (the q149 divergence class) — clamping at the
        // mathematical floor of 0 removes the negative-numerator case
        // from both engines
        (expr("greatest(sa, 0L) div (2 * at)") +
          expr("greatest(sb, 0L) div (2 * bt)")).as("js_micro_nat"),
        $"n_shared", $"n_only_1", $"n_only_2")
      .orderBy($"s1", $"s2")
  }

  val q173Sql: String =
    """WITH tok AS (SELECT source,
      |        unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      |        FROM documents),
      | c AS (SELECT source, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
      | t AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS tot
      |        FROM c GROUP BY 1),
      | p AS (SELECT a.source AS s1, b.source AS s2,
      |        a.tot AS at, b.tot AS bt
      |        FROM t a JOIN t b ON a.source < b.source),
      | u AS (SELECT DISTINCT c2.token, p.s1, p.s2, p.at, p.bt
      |        FROM p JOIN c c2 ON c2.source = p.s1 OR c2.source = p.s2),
      | g AS (SELECT u.s1, u.s2, u.at, u.bt,
      |        COALESCE(l.cnt, 0) AS a, COALESCE(r.cnt, 0) AS b
      |        FROM u
      |        LEFT JOIN c l ON l.source = u.s1 AND l.token = u.token
      |        LEFT JOIN c r ON r.source = u.s2 AND r.token = u.token)
      |SELECT s1, s2,
      |       CAST(GREATEST(SUM(CASE WHEN a > 0 THEN a * CAST(floor(1000000.0 *
      |              ln((2.0 * a * bt) / (CAST(a AS DOUBLE) * bt
      |                                   + CAST(b AS DOUBLE) * at)))
      |              AS BIGINT) ELSE 0 END), 0) // (2 * at)
      |          + GREATEST(SUM(CASE WHEN b > 0 THEN b * CAST(floor(1000000.0 *
      |              ln((2.0 * b * at) / (CAST(a AS DOUBLE) * bt
      |                                   + CAST(b AS DOUBLE) * at)))
      |              AS BIGINT) ELSE 0 END), 0) // (2 * bt) AS BIGINT)
      |         AS js_micro_nat,
      |       CAST(SUM(CASE WHEN a > 0 AND b > 0 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_shared,
      |       CAST(SUM(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_only_1,
      |       CAST(SUM(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_only_2
      |FROM g GROUP BY s1, s2, at, bt ORDER BY s1, s2""".stripMargin

  // --------------------------------------------------------------------
  // q174 — Zipf profile: token frequencies at power-of-two ranks plus
  // the local Zipf exponent (the ln-ln slope between successive
  // samples, micro-nat floors) — rank-frequency structure diagnosed
  // without fitting floats. The global rank over (cnt DESC, token ASC)
  // comes from GlobalRank.withRank (range partition + zipWithIndex),
  // NEVER an unpartitioned window (the q158 rule); the lag window then
  // orders only the ~log₂(V) sampled rows (the q139/q140 bounded-domain
  // class).
  def q174(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cnts = t(s, dir, "documents")
      .select(explode(split(trim($"text"), "\\s+")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
    val sampled = graft.operators.GlobalRank
      .withRank(cnts, Seq($"cnt".desc, $"token".asc), "rank")
      .filter(expr("(rank & (rank - 1)) = 0")) // powers of two
      .select($"rank", $"cnt",
        floor(lit(1000000.0) * log($"rank".cast("double")))
          .cast("long").as("ln_rank_micro"),
        floor(lit(1000000.0) * log($"cnt".cast("double")))
          .cast("long").as("ln_cnt_micro"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"rank")
    sampled
      .select($"rank", $"cnt", $"ln_rank_micro", $"ln_cnt_micro",
        (lag($"ln_cnt_micro", 1).over(w) - $"ln_cnt_micro")
          .as("dy"),
        ($"ln_rank_micro" - lag($"ln_rank_micro", 1).over(w))
          .as("dx"))
      .select($"rank", $"cnt", $"ln_rank_micro", $"ln_cnt_micro",
        when($"dx".isNotNull && $"dx" > 0,
          expr("-((dy * 1000000) div dx)")).as("zipf_slope_micro"))
      .orderBy($"rank")
  }

  val q174Sql: String =
    """WITH c AS (SELECT token, count(*) AS cnt FROM (
      |        SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
      |          AS token FROM documents) GROUP BY token),
      | r AS (SELECT cnt,
      |        row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank
      |        FROM c),
      | s AS (SELECT rank, cnt,
      |        CAST(floor(1000000.0 * ln(CAST(rank AS DOUBLE)))
      |          AS BIGINT) AS ln_rank_micro,
      |        CAST(floor(1000000.0 * ln(CAST(cnt AS DOUBLE)))
      |          AS BIGINT) AS ln_cnt_micro
      |        FROM r WHERE (rank & (rank - 1)) = 0),
      | d AS (SELECT rank, cnt, ln_rank_micro, ln_cnt_micro,
      |        lag(ln_cnt_micro) OVER (ORDER BY rank) - ln_cnt_micro
      |          AS dy,
      |        ln_rank_micro - lag(ln_rank_micro) OVER (ORDER BY rank)
      |          AS dx
      |        FROM s)
      |SELECT rank, cnt, ln_rank_micro, ln_cnt_micro,
      |       CAST(CASE WHEN dx IS NOT NULL AND dx > 0
      |            THEN -((dy * 1000000) // dx) END AS BIGINT)
      |         AS zipf_slope_micro
      |FROM d ORDER BY rank""".stripMargin

  // --------------------------------------------------------------------
  // q175 — BPE merge training (TrainPrep.bpeMerges): the first 3
  // byte-pair merges learned from the corpus's word-frequency table,
  // with the vocab/token trajectory after each merge. The iteration
  // state is the BOUNDED distinct-word frame; see the operator doc for
  // the determinism story (struct-min argmax, engine-portable
  // non-overlapping replace). Oracle unrolls the same 3 rounds as
  // MATERIALIZED CTEs (the q167 rake pattern).
  def q175(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = t(s, dir, "documents")
      .select(explode(split(lower(trim($"text")), "\\s+")).as("word"))
      .filter($"word".rlike("^[a-z]+$"))
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
    graft.ext.TrainPrep.bpeMerges(words, "word", "cnt", rounds = 3)._1
      .orderBy($"round")
  }

  private def bpeRoundSql(r: Int): String = {
    val (prev, cur) = (s"w${r - 1}", s"w$r")
    s"""p$r AS MATERIALIZED (
       |  SELECT pair, CAST(sum(cnt) AS BIGINT) AS pcnt FROM (
       |    SELECT cnt, unnest(list_transform(range(2, len(s) + 1),
       |             i -> s[i - 1] || ' ' || s[i])) AS pair
       |    FROM (SELECT cnt, string_split(sym, ' ') AS s FROM $prev
       |          WHERE contains(sym, ' ')))
       |  GROUP BY pair),
       | b$r AS MATERIALIZED (
       |  SELECT pair, replace(pair, ' ', '') AS merged, pcnt
       |  FROM p$r ORDER BY pcnt DESC, pair ASC LIMIT 1),
       | $cur AS MATERIALIZED (
       |  -- degenerate round (vocab fully merged → b$r empty): the scalar
       |  -- subqueries go NULL and a bare replace(sym, NULL, NULL) would
       |  -- null EVERY sym; COALESCE onto a sentinel that can never occur
       |  -- in sym (syms are space-joined [a-z] runs) makes the replace a
       |  -- no-op, mirroring the Spark operator's when(pair.isNull, sym)
       |  SELECT trim(replace(' ' || sym || ' ',
       |           COALESCE((SELECT ' ' || pair || ' ' FROM b$r), '§'),
       |           COALESCE((SELECT ' ' || merged || ' ' FROM b$r), '§')))
       |         AS sym, cnt
       |  FROM $prev),
       | s$r AS (
       |  SELECT CAST($r AS BIGINT) AS round,
       |    (SELECT pair FROM b$r) AS pair,
       |    (SELECT merged FROM b$r) AS merged,
       |    (SELECT pcnt FROM b$r) AS pair_cnt,
       |    (SELECT CAST(count(DISTINCT symb) AS BIGINT) FROM
       |       (SELECT unnest(string_split(sym, ' ')) AS symb FROM $cur))
       |      AS vocab_after,
       |    (SELECT CAST(sum(cnt * len(string_split(sym, ' '))) AS BIGINT)
       |       FROM $cur) AS tokens_after)""".stripMargin
  }

  val q175Sql: String =
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT array_to_string(regexp_split_to_array(word, ''), ' ')
       |           AS sym,
       |         CAST(cnt AS BIGINT) AS cnt FROM (
       |    SELECT word, count(*) AS cnt FROM (
       |      SELECT unnest(regexp_split_to_array(lower(trim(text)),
       |               '\\s+')) AS word FROM documents)
       |    WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY word)),
       | ${bpeRoundSql(1)},
       | ${bpeRoundSql(2)},
       | ${bpeRoundSql(3)}
       |SELECT * FROM s1 UNION ALL SELECT * FROM s2
       |UNION ALL SELECT * FROM s3 ORDER BY round""".stripMargin

  // --------------------------------------------------------------------
  // q176 — encoded-corpus token histogram: the top-10 BPE tokens (by
  // corpus count, ties token-asc) after applying q175's 3 learned
  // merges — the "what did the tokenizer learn" readout. Spark side
  // re-encodes the word frame with TrainPrep.bpeEncode from the
  // COLLECTED merge list (bounded driver metadata, the IVF-centroid
  // contract — 3 strings here), proving the train→apply round trip;
  // the histogram is one vocab-frame agg (symbols weighted by word
  // count, the corpus is never re-scanned). Deterministic lossy top-k
  // (T1/T2 precedent).
  def q176(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = t(s, dir, "documents")
      .select(explode(split(lower(trim($"text")), "\\s+")).as("word"))
      .filter($"word".rlike("^[a-z]+$"))
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
    val merges = graft.ext.TrainPrep
      .bpeMerges(words, "word", "cnt", rounds = 3)._1
      .orderBy($"round").collect() // bounded: one row per round
      .flatMap(r => Option(r.getAs[String]("pair")))
      .toSeq
    graft.ext.TrainPrep.bpeEncode(words, "word", merges)
      .select($"cnt", explode(split($"sym", " ")).as("token"))
      .groupBy($"token").agg(sum($"cnt").as("n"))
      .orderBy($"n".desc, $"token".asc)
      .limit(10)
  }

  val q176Sql: String =
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT array_to_string(regexp_split_to_array(word, ''), ' ')
       |           AS sym,
       |         CAST(cnt AS BIGINT) AS cnt FROM (
       |    SELECT word, count(*) AS cnt FROM (
       |      SELECT unnest(regexp_split_to_array(lower(trim(text)),
       |               '\\s+')) AS word FROM documents)
       |    WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY word)),
       | ${bpeRoundSql(1)},
       | ${bpeRoundSql(2)},
       | ${bpeRoundSql(3)}
       |SELECT symb AS token, CAST(sum(cnt) AS BIGINT) AS n FROM (
       |  SELECT cnt, unnest(string_split(sym, ' ')) AS symb FROM w3)
       |GROUP BY symb ORDER BY n DESC, token ASC LIMIT 10""".stripMargin

  // --------------------------------------------------------------------
  // q177 — n-gram diversity per source: type-token ratio at n ∈
  // {1, 2, 3} in integer ppm — the "is this source templated /
  // machine-generated" signal (generated text repeats n-grams far more
  // than human text; the distinct-n family of diversity metrics). Only
  // FULL n-grams count (docs shorter than n tokens are skipped at that
  // n, both engines).
  //
  // Scale: ONE linear scan — the native NGramRangeExplode generator
  // emits all three gram widths in a single pass (full grams only, so
  // short docs drop out per-n in both engines), feeding a
  // (source, n)-keyed count+distinct agg; distinct is the standard
  // two-level expand — no window, nothing driver-side. A union of
  // three single-width scans was the first cut: 3× the corpus IO a
  // 100 TB profile job would pay for nothing. Gram-frequency skew
  // ("the the") is a count agg, not a join — no salting needed.
  def q177(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"source", split(trim($"text"), "\\s+").as("toks"))
      .select($"source", graft.plans.NGramRangeExplode.of($"toks", 1, 3))
      .select($"source", $"n".cast("long").as("n"), $"ngram".as("g"))
      .groupBy($"source", $"n")
      .agg(count(lit(1)).as("total_grams"),
        countDistinct($"g").as("distinct_grams"))
      .select($"source", $"n", $"total_grams", $"distinct_grams",
        expr("distinct_grams * 1000000 div total_grams").as("ttr_ppm"))
      .orderBy($"source", $"n")
  }

  val q177Sql: String = {
    def g(n: Int) =
      s"""SELECT source, CAST($n AS BIGINT) AS n,
         |  unnest(list_transform(range(1, len(t) - $n + 2),
         |    i -> array_to_string(t[i:i+${n - 1}], ' '))) AS g
         |FROM tk WHERE len(t) >= $n""".stripMargin
    s"""WITH tk AS (SELECT source,
       |        regexp_split_to_array(trim(text), '\\s+') AS t
       |        FROM documents),
       | ag AS (${g(1)} UNION ALL ${g(2)} UNION ALL ${g(3)})
       |SELECT source, n, count(*) AS total_grams,
       |       CAST(count(DISTINCT g) AS BIGINT) AS distinct_grams,
       |       CAST(count(DISTINCT g) * 1000000 // count(*) AS BIGINT)
       |         AS ttr_ppm
       |FROM ag GROUP BY source, n ORDER BY source, n""".stripMargin
  }

  // --------------------------------------------------------------------
  // q178 — token (Shannon) entropy per source AND corpus-wide in one
  // ROLLUP pass, integer micro-nats — the second diversity axis beside
  // q177's TTR (TTR sees type counts, entropy sees the shape of the
  // frequency mass; templated text craters both). The identity
  //   H = ln N − (Σ c·ln c)/N
  // keeps everything integer: per-token floor(10⁶·ln c) weighted by c,
  // folded per group, subtracted from floor(10⁶·ln N) with a final
  // integer div — partial-sum order can't move a digit.
  //
  // Scale: one (source, token) agg over the corpus; the per-source
  // rows aggregate that frame by source, the corpus row re-aggregates
  // it by token first (a ROLLUP total would keep PER-SOURCE counts and
  // quietly compute the joint H(source, token), not corpus H(token) —
  // a token shared by 20 sources must fold as one count; the spec
  // caught the rollup first cut doing exactly that). Both run on the
  // token-distinct frame, never the corpus. No window, no collect.
  // The arithmetic lives in Profile.textProfile (CLI `text-profile`).
  def q178(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.ext.Profile
      .textProfile(t(s, dir, "documents"), "text", "source")
      .select($"grp".as("source"), $"n_tokens", $"n_types",
        $"entropy_micro_nat")
      .orderBy($"source")
  }

  val q178Sql: String =
    """WITH c AS (SELECT source, token, count(*) AS c FROM (
      |        SELECT source,
      |          unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      |        FROM documents) GROUP BY source, token),
      | ps AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
      |        count(*) AS n_types,
      |        CAST(sum(c * CAST(floor(1000000.0 * ln(CAST(c AS DOUBLE)))
      |          AS BIGINT)) AS BIGINT) AS s_clnc
      |        FROM c GROUP BY source),
      | ct AS (SELECT token, CAST(sum(c) AS BIGINT) AS c
      |        FROM c GROUP BY token),
      | al AS (SELECT '__all__' AS source,
      |        CAST(sum(c) AS BIGINT) AS n_tokens,
      |        count(*) AS n_types,
      |        CAST(sum(c * CAST(floor(1000000.0 * ln(CAST(c AS DOUBLE)))
      |          AS BIGINT)) AS BIGINT) AS s_clnc
      |        FROM ct),
      | g AS (SELECT * FROM ps UNION ALL SELECT * FROM al)
      |SELECT source, n_tokens, n_types,
      |       CAST(CAST(floor(1000000.0 * ln(CAST(n_tokens AS DOUBLE)))
      |              AS BIGINT) - s_clnc // n_tokens AS BIGINT)
      |         AS entropy_micro_nat
      |FROM g ORDER BY source""".stripMargin

  /** Name → query function, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q170_calibration_ece" -> (q170 _),
    "q171_average_precision" -> (q171 _),
    "q172_vocab_growth" -> (q172 _),
    "q173_source_js_divergence" -> (q173 _),
    "q174_zipf_profile" -> (q174 _),
    "q175_bpe_merges" -> (q175 _),
    "q176_bpe_token_histogram" -> (q176 _),
    "q177_ngram_diversity" -> (q177 _),
    "q178_token_entropy" -> (q178 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q170_calibration_ece" -> q170Sql,
    "q171_average_precision" -> q171Sql,
    "q172_vocab_growth" -> q172Sql,
    "q173_source_js_divergence" -> q173Sql,
    "q174_zipf_profile" -> q174Sql,
    "q175_bpe_merges" -> q175Sql,
    "q176_bpe_token_histogram" -> q176Sql,
    "q177_ngram_diversity" -> q177Sql,
    "q178_token_entropy" -> q178Sql
  )
}
