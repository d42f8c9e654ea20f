package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality pass a pipeline runs before
  * training ingestion: per-column row/null/distinct counts and
  * lexicographic min/max, as one declarative job.
  *
  * Layout: values are stringified and exploded to a long (column, value)
  * stream, then hash-aggregated per column — ONE shuffle keyed by column
  * name, partial aggs map-side. The scan reads each row once; the
  * explode multiplies in-memory tuples, not I/O. (The alternative — a
  * single wide agg row with 5 expressions per column — avoids the
  * explode but produces an unqueryable 5N-column row; long format is
  * the standard profiling shape.)
  *
  * min/max compare the STRINGIFIED value (documented: lexicographic, so
  * numeric columns profile their string order). Distinct is exact;
  * swap count_distinct for approx_count_distinct at the 100 TB tier.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val entries = array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)
    df.select(explode(entries).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.v").as("v"))
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("v").isNull, 1)).as("n_null"),
        count_distinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_str"),
        max(col("v")).as("max_str"))
  }

  /** Text diversity profile per group plus a corpus `__all__` row:
    * token count, vocabulary size, unigram type-token ratio (ppm) and
    * Shannon token entropy H = ln N − (Σ c·ln c)/N (micro-nats) — the
    * q177/q178 integer arithmetic as a reusable operator (every term
    * floored, so partial-sum order can't move a digit; templated or
    * machine-generated text craters both metrics).
    *
    * Scale: one (group, token) agg over the corpus; the per-group fold
    * and the corpus fold both run on the token-distinct frame. The
    * corpus row RE-AGGREGATES by token first — a rollup total would
    * keep per-group counts and quietly compute the joint
    * H(group, token) (the q178 spec caught exactly that). */
  def textProfile(docs: DataFrame, textCol: String,
      groupCol: String): DataFrame =
    textProfileFromCounts(tokenCounts(docs, textCol, groupCol))

  /** The profile's MERGEABLE state: the (grp, token, c) unigram count
    * frame. A shard's count frame merges into the corpus frame by
    * summing counts ([[mergeTokenCounts]]) — counts are decomposable
    * (the [[IncrementalAgg]] algebra), so profile shards combine
    * WITHOUT re-scanning text: merge(counts(A), counts(B)) ==
    * counts(A ∪ B) exactly, and every downstream statistic
    * ([[textProfileFromCounts]], [[unigramDrift]]) is a function of the
    * count frame alone. This is what lets a 100 TB corpus keep a live
    * profile: each ingest batch contributes its shard frame, the
    * profile job folds merged counts. */
  def tokenCounts(docs: DataFrame, textCol: String,
      groupCol: String): DataFrame = docs
    .select(col(groupCol).cast("string").as("grp"),
      explode(graft.functions.TextFns.tokens(col(textCol))).as("token"))
    .groupBy(col("grp"), col("token")).agg(count(lit(1)).as("c"))

  /** Sum-merge shard count frames (see [[tokenCounts]]): one keyed agg
    * over the union of the token-distinct shard frames — cost scales
    * with vocabulary, never the corpus. */
  def mergeTokenCounts(shards: Seq[DataFrame]): DataFrame = {
    require(shards.nonEmpty, "mergeTokenCounts needs at least one shard")
    shards.reduce(_ unionByName _)
      .groupBy(col("grp"), col("token")).agg(sum(col("c")).as("c"))
  }

  /** [[textProfile]]'s fold, over an already-built (grp, token, c)
    * count frame — the read side of the merge contract. */
  def textProfileFromCounts(c: DataFrame): DataFrame = {
    def fold(g: org.apache.spark.sql.RelationalGroupedDataset,
        label: org.apache.spark.sql.Column): DataFrame = g
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c") * floor(lit(1000000.0) * log(col("c").cast("double")))
          .cast("long")).as("s_clnc"))
      .select(label.as("grp"), col("n_tokens"), col("n_types"),
        expr("n_types * 1000000 div n_tokens").as("ttr_ppm"),
        (floor(lit(1000000.0) * log(col("n_tokens").cast("double")))
          .cast("long") - expr("s_clnc div n_tokens"))
          .as("entropy_micro_nat"))
    fold(c.groupBy(col("grp")), col("grp"))
      .unionByName(fold(
        c.groupBy(col("token")).agg(sum(col("c")).as("c")).groupBy(),
        lit("__all__")))
  }

  /** Per-group unigram drift vs the corpus: total-variation distance in
    * ppm (the q169 integer doctrine — floored ppm ratios of exact
    * counts, |p − q| summed, div 2), computed over a (grp, token, c)
    * count frame — typically the MERGED shard frame, so the drift
    * monitor never re-scans the corpus.
    *
    * A token ABSENT from a group still contributes its corpus mass to
    * that group's drift (p = 0 cell) — the grid is corpus-token-frame ×
    * broadcast group totals, the q173 fan-out shape: |V|·|groups| rows
    * on the token-distinct frame, never the corpus. Integer headroom:
    * corpus token count · 10⁶ caps at ~9·10¹² occurrences of one token;
    * past that, scale to per-mille before ppm-ing the tail.
    *
    * @return (grp, n_tokens, tvd_ppm) per group, tvd in [0, 10⁶]
    */
  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    * PageRank over the token co-occurrence graph, window = 2 — an
    * undirected edge links every pair of ADJACENT whitespace tokens
    * anywhere in the corpus, and a token's rank is its stationary
    * centrality, not its frequency (a rare token bridging frequent
    * neighborhoods outranks a frequent-but-peripheral one — what
    * TF-style scoring can't see). Edges are canonicalized
    * (least/greatest, self-pairs dropped), deduplicated, then
    * symmetrized into [[Graph.pageRank]]'s layout with token STRINGS
    * as node ids — the rank loop is the q134 integer-exact ppt
    * arithmetic, so the whole chain replays bit-for-bit in any
    * engine.
    *
    * Scale: the pair explode is per-row work on the token stream (no
    * shuffle), the dedup and each superstep shuffle VOCABULARY-sized
    * frames keyed by token — corpus size enters only through the one
    * linear scan. Fixed iteration count (no convergence probe), the
    * q134 choice for oracle-replayable rank read-outs.
    *
    * @return (word, rank_ppt) — k rows, rank desc, ties word asc */
  def textRankKeywords(docs: DataFrame, textCol: String,
      iterations: Int = 3, k: Int = 15): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs.select(
      graft.functions.TextFns.tokens(col(textCol)).as("__ts"))
    val adj = toks.select(explode(arrays_zip(
        slice(col("__ts"), lit(1), greatest(size(col("__ts")) - 1, lit(0))),
        slice(col("__ts"), lit(2), greatest(size(col("__ts")) - 1, lit(0)))))
        .as("__p"))
      .select(col("__p.0").as("a"), col("__p.1").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val edges = adj.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(adj.select(col("b").as("src"), col("a").as("dst")))
    Graph.pageRank(edges, maxIterations = iterations,
        checkConvergence = false)
      .select(col("node").as("word"), col("r").as("rank_ppt"))
      .orderBy(col("rank_ppt").desc, col("word").asc)
      .limit(k)
  }

  /** Per-source corpus datasheet — the one-page summary a dataset card
    * leads with (Gebru et al., "Datasheets for Datasets"), as two
    * aggregations: per-source doc/char/token totals, integer mean
    * length, short-doc and exact-duplicate rates (ppm), language
    * spread, and the majority language. All counting is integer-exact
    * (div/ppm — no float partial sums), duplicates are detected on
    * `md5(text)` (engine-portable, collision-free at corpus scale),
    * and the majority language breaks ties deterministically
    * (count desc, lang desc).
    *
    * Scale: one map-side-combinable agg keyed by source over the
    * corpus scan (the only corpus-sized work), one (source, lang) agg
    * whose output is vocabulary-sized, one broadcast-sized join. The
    * exact `count(DISTINCT md5)` shuffles digests; swap for an HLL
    * sketch column ([[QuantileSketch]] shelf) when ±2% suffices at
    * the 100 TB tier.
    *
    * @return (source, n_docs, sum_chars, mean_chars, short_ppm,
    *         dup_ppm, n_langs, top_lang) — one row per source */
  def datasheet(docs: DataFrame, sourceCol: String, textCol: String,
      langCol: String, shortBelowChars: Int = 100): DataFrame = {
    val base = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).as("sum_chars"),
        sum(when(length(col(textCol)) < shortBelowChars, 1L)
          .otherwise(0L)).as("__short"),
        countDistinct(md5(col(textCol))).as("__uniq"),
        countDistinct(col(langCol)).as("n_langs"))
      .select(col(sourceCol), col("n_docs"), col("sum_chars"),
        expr("sum_chars div n_docs").as("mean_chars"),
        expr("__short * 1000000L div n_docs").as("short_ppm"),
        expr("(n_docs - __uniq) * 1000000L div n_docs").as("dup_ppm"),
        col("n_langs"))
    val top = docs.groupBy(col(sourceCol), col(langCol))
      .agg(count(lit(1)).as("__lc"))
      .groupBy(col(sourceCol))
      .agg(max(struct(col("__lc"), col(langCol).as("__lang"))).as("__m"))
      .select(col(sourceCol), col("__m.__lang").as("top_lang"))
    base.join(broadcast(top), Seq(sourceCol))
  }

  /** Cross-group vocabulary-overlap estimates from K-Minimum-Values
    * sketches ([[graft.functions.KmvSketch]]): per group, the k smallest
    * md5 hashes of the group's word-BIGRAM set (one tokenize/explode
    * scan, bounded mergeable aggregate); per group pair, the Beyer et
    * al. (SIGMOD 2007) estimator — of the k smallest hashes in the
    * union of the two sketches, the fraction present in BOTH estimates
    * Jaccard. Entirely string/integer arithmetic (ppm by integer
    * division), so the estimate is reproducible across engines.
    *
    * Scale shape: the sketch aggregate ships O(groups × k) strings
    * through the shuffle however many rows feed it; the pair stage is
    * groups², on sketches — driver-scale, not corpus-scale.
    *
    * @return (group_a, group_b, k_used, matches, jac_ppm), group_a <
    *         group_b, ordered
    */
  def kmvSourceOverlap(docs: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val kmv = udaf(graft.functions.KmvSketch(k),
      org.apache.spark.sql.Encoders.STRING)
    val ts = split(trim(col(textCol)), "\\s+")
    val grams = docs
      .select(col(groupCol).as("__grp"), ts.as("__ts"))
      .select(col("__grp"), explode(when(size(col("__ts")) >= 2,
        transform(sequence(lit(1), size(col("__ts")) - 1),
          i => concat(element_at(col("__ts"), i), lit(" "),
            element_at(col("__ts"), i + 1))))
        .otherwise(array())).as("__g"))
    val sk = grams.select(col("__grp"), md5(col("__g")).as("__h"))
      .groupBy(col("__grp")).agg(kmv(col("__h")).as("__sk"))
    sk.as("a").join(sk.as("b"), col("a.__grp") < col("b.__grp"))
      .select(col("a.__grp").as("source_a"), col("b.__grp").as("source_b"),
        col("a.__sk").as("ska"), col("b.__sk").as("skb"))
      .withColumn("u",
        slice(array_sort(array_distinct(concat(col("ska"), col("skb")))), 1, k))
      .withColumn("k_used", size(col("u")).cast("long"))
      .withColumn("matches",
        size(filter(col("u"), h =>
          array_contains(col("ska"), h) && array_contains(col("skb"), h)))
          .cast("long"))
      .select(col("source_a"), col("source_b"), col("k_used"), col("matches"),
        expr("(matches * 1000000) div k_used").as("jac_ppm"))
      .orderBy(col("source_a"), col("source_b"))
  }

  def unigramDrift(counts: DataFrame): DataFrame = {
    val n = counts.agg(sum(col("c")).as("n"))
    val corpusTok = counts.groupBy(col("token")).agg(sum(col("c")).as("cc"))
      .crossJoin(broadcast(n))
      .select(col("token"), expr("cc * 1000000 div n").as("q_ppm"))
    val grpTotals = counts.groupBy(col("grp")).agg(sum(col("c")).as("ng"))
    corpusTok.crossJoin(broadcast(grpTotals))
      .join(counts, Seq("grp", "token"), "left")
      .select(col("grp"), col("ng"),
        abs(expr("coalesce(c, 0L) * 1000000 div ng") - col("q_ppm"))
          .as("gap"))
      .groupBy(col("grp"))
      .agg(max(col("ng")).as("n_tokens"),
        expr("sum(gap) div 2").as("tvd_ppm"))
      .select(col("grp"), col("n_tokens"), col("tvd_ppm"))
  }
}
