package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** N-gram language-model quality filtering as a LIBRARY operator — the
  * q130 unigram perplexity proxy grown into the real CCNet/KenLM-style
  * shape: a BIGRAM model with interpolated unigram backoff, trained on
  * one (clean) corpus and scoring another, with the trained model a
  * mergeable count frame (the [[Profile]]/[[IncrementalAgg]] algebra)
  * so shards train independently and fold without re-scanning text.
  *
  * Probability model (interpolated, Jelinek–Mercer with integer-ratio
  * λ): P(v|u) = (λn·c(u,v)/c(u·)) + ((λd−λn)/λd)·(c(·v)/N), λ = λn/λd.
  * Every probability is a ratio of exact BIGINT counts, so the
  * per-TYPE negative log-likelihood floor(−ln(P)·10⁶) is one
  * deterministic double op per distinct bigram — the q130 micro-nat
  * doctrine — and per-doc sums are integer-exact under any aggregation
  * order. Unseen continuation words (c(·v) = 0 in the training corpus)
  * get the OOV floor `oovMicroNat` instead of ∞, the standard
  * open-vocabulary treatment.
  *
  * Scale shape: [[bigramCounts]] is one scan (adjacent-pair zip, no
  * self-join) + one keyed agg, map-side combinable; [[mergeCounts]]
  * folds shard frames on the bigram-TYPE domain (vocabulary², bounded
  * by observed types — never the corpus); [[scoreBigrams]] shuffles
  * scored docs on the bigram key to meet the broadcast-or-shuffled
  * model frame — the stopword-head skew there is the q93/saltedJoin
  * territory, and the model side is ≤ a few rows per key so AQE
  * skew-split applies cleanly.
  */
object LanguageModel {

  /** Adjacent-pair frame of a document table: one row per bigram
    * OCCURRENCE position collapsed to (doc_id, u, v, occ) — repeats
    * collapse map-side before any join. Documents with < 2 tokens
    * contribute nothing (no transitions). */
  def docBigrams(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), TextFns.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(slice(toks, 1, size(toks) - 1),
          |          (t, i) -> struct(t AS u, toks[i + 1] AS v))""".stripMargin))
        .as("bg"))
      .select(col("doc_id"), col("bg.u").as("u"), col("bg.v").as("v"))
      .groupBy(col("doc_id"), col("u"), col("v"))
      .agg(count(lit(1)).as("occ"))

  /** The model's MERGEABLE state: the (u, v, c) bigram count frame of a
    * training corpus (shard). Sum-merge shards with [[mergeCounts]];
    * unigram/continuation/total counts all derive from this one frame,
    * so it is the ONLY state a live 100 TB quality filter maintains. */
  def bigramCounts(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docBigrams(docs, textCol, idCol)
      .groupBy(col("u"), col("v")).agg(sum(col("occ")).as("c"))

  /** Sum-merge shard bigram-count frames: one keyed agg on the
    * type-distinct union — merge(counts(A), counts(B)) == counts(A∪B)
    * exactly, cost tracks vocabulary², never corpus size. */
  def mergeCounts(shards: Seq[DataFrame]): DataFrame = {
    require(shards.nonEmpty, "mergeCounts needs at least one shard")
    shards.reduce(_ unionByName _)
      .groupBy(col("u"), col("v")).agg(sum(col("c")).as("c"))
  }

  /** Expand a bigram-count frame into the scoring model: one row per
    * trained bigram TYPE with its interpolated floor-micro-nat NLL,
    * plus the unigram-backoff frame for unseen-bigram fallback.
    *
    * @param lambdaNum/lambdaDen interpolation weight λ = num/den on the
    *        bigram term (remainder goes to the unigram backoff) —
    *        integer ratio so both engines compute the same double
    * @return (bigram model (u, v, nll_micro), backoff model
    *         (v, bo_micro)) — both bounded by observed types
    */
  def bigramModel(counts: DataFrame, lambdaNum: Int = 9, lambdaDen: Int = 10)
      : (DataFrame, DataFrame) = {
    require(lambdaNum >= 1 && lambdaNum < lambdaDen,
      s"need 0 < lambdaNum/lambdaDen < 1, got $lambdaNum/$lambdaDen")
    // both constants computed as correctly-rounded decimal ratios so a
    // SQL oracle's literal (e.g. 0.9 / 0.1) is the SAME double — never
    // 1.0 − λ, whose binary rounding differs from the literal
    val lam = lambdaNum.toDouble / lambdaDen.toDouble
    val oneMinusLam = (lambdaDen - lambdaNum).toDouble / lambdaDen.toDouble
    val uCnt = counts.groupBy(col("u")).agg(sum(col("c")).as("cu"))
    val vCnt = counts.groupBy(col("v")).agg(sum(col("c")).as("cv"))
    val n = counts.agg(sum(col("c")).as("n"))
    // backoff-only probability for bigrams unseen in training:
    // (1−λ)·c(·v)/N, one row per continuation type
    val backoff = vCnt.crossJoin(broadcast(n))
      .select(col("v"),
        floor(-log(lit(oneMinusLam) * col("cv").cast("double")
          / col("n").cast("double")) * lit(1000000.0)).cast("long")
          .as("bo_micro"))
    val bigram = counts
      .join(uCnt, "u")
      .join(vCnt, "v")
      .crossJoin(broadcast(n))
      .select(col("u"), col("v"),
        floor(-log(
          lit(lam) * col("c").cast("double") / col("cu").cast("double")
            + lit(oneMinusLam) * col("cv").cast("double")
              / col("n").cast("double")) * lit(1000000.0)).cast("long")
          .as("nll_micro"))
    (bigram, backoff)
  }

  /** Score documents against a trained model: average per-transition
    * NLL in micro-nats (lower = more fluent under the training
    * corpus — the CCNet keep-the-low-perplexity-tail filter reads the
    * `nll_avg_micro` column). Bigrams unseen in training back off to
    * the continuation unigram; continuations never seen at all take
    * `oovMicroNat`.
    *
    * @return (doc_id, n_trans, nll_sum_micro, nll_avg_micro), one row
    *         per document with ≥ 1 transition
    */
  def scoreBigrams(docs: DataFrame, textCol: String, idCol: String,
      model: (DataFrame, DataFrame),
      oovMicroNat: Long = 20000000L): DataFrame = {
    val (bigram, backoff) = model
    docBigrams(docs, textCol, idCol)
      .join(bigram, Seq("u", "v"), "left")
      .join(backoff, Seq("v"), "left")
      .select(col("doc_id"), col("occ"),
        coalesce(col("nll_micro"), col("bo_micro"), lit(oovMicroNat))
          .as("nll"))
      .groupBy(col("doc_id"))
      .agg(sum(col("occ")).as("n_trans"),
        sum(col("occ") * col("nll")).as("nll_sum_micro"))
      .select(col("doc_id"), col("n_trans"), col("nll_sum_micro"),
        expr("nll_sum_micro div n_trans").as("nll_avg_micro"))
  }
}
