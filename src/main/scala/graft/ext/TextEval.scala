package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Reference–candidate text-overlap metrics (ROUGE, BLEU) over
  * candidate document PAIRS — the verification family a dedup
  * pipeline runs on its near-duplicate candidates: LSH says "these
  * two look alike", ROUGE/BLEU price HOW alike in interpretable
  * units before a keep/drop decision.
  *
  * Scale shape: per-doc gram COUNT frames (id, gram, count) meet the
  * pair list through two shuffle joins — first on the a-side id,
  * then on (b-side id, gram) — so the joined volume is bounded by
  * (candidate pairs × doc length), never corpus². All exactness
  * follows the house rules: ROUGE F1 reduces to the exact integer
  * 2·overlap/(lenA+lenB) (the harmonic identity — no float P and R
  * ever exist), and BLEU's brevity penalty × geometric mean is ONE
  * double expression mirrored in the oracle.
  */
object TextEval {

  /** ROUGE-1/2 F1 (ppm) and BLEU-2 (ppm) for each (id_a, id_b) pair;
    * a is the reference, b the candidate (F1 is symmetric; BLEU's
    * brevity penalty is not). Token bigrams use the q55 padding
    * convention ([[TextFns.ngramsFromTokens]]): a 1-token document
    * contributes its token as the single "bigram", so l2 ≥ 1 and the
    * denominators never vanish. Pairs with zero overlap read 0.
    *
    * Output: ia, ib, rouge1_f_ppm, rouge2_f_ppm, bleu2_ppm,
    * ordered by (ia, ib).
    */
  def rougeBleuPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, pairACol: String = "id_a",
      pairBCol: String = "id_b"): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // tokenize ONCE: three consumers (unigram counts, bigram counts,
    // lengths) would each re-run the split otherwise
    val toks = docs.select(col(idCol).cast("long").as("id"),
      TextFns.tokens(col(textCol)).as("t")).localCheckpoint()
    val uni = toks.select($"id", explode($"t").as("g"))
      .groupBy($"id", $"g").agg(count(lit(1)).as("c"))
    val big = toks
      .select($"id", explode(TextFns.ngramsFromTokens($"t", 2)).as("g"))
      .groupBy($"id", $"g").agg(count(lit(1)).as("c"))
    val lens = toks.select($"id", size($"t").cast("long").as("l1"),
      greatest(size($"t") - 1, lit(1)).cast("long").as("l2"))
    val pr = pairs.select(col(pairACol).cast("long").as("ia"),
      col(pairBCol).cast("long").as("ib"))
    // multiset overlap: sum over shared grams of min(count_a, count_b)
    def overlap(cnt: DataFrame, out: String): DataFrame =
      pr.join(cnt.select($"id".as("ia"), $"g", $"c".as("ca")), Seq("ia"))
        .join(cnt.select($"id".as("ib"), $"g", $"c".as("cb")),
          Seq("ib", "g"))
        .groupBy($"ia", $"ib").agg(sum(least($"ca", $"cb")).as(out))
    pr
      .join(overlap(uni, "ov1"), Seq("ia", "ib"), "left")
      .join(overlap(big, "ov2"), Seq("ia", "ib"), "left")
      .na.fill(0L, Seq("ov1", "ov2"))
      .join(lens.select($"id".as("ia"), $"l1".as("l1a"), $"l2".as("l2a")),
        Seq("ia"))
      .join(lens.select($"id".as("ib"), $"l1".as("l1b"), $"l2".as("l2b")),
        Seq("ib"))
      .select($"ia", $"ib",
        expr("(2 * ov1 * 1000000) div (l1a + l1b)").as("rouge1_f_ppm"),
        expr("(2 * ov2 * 1000000) div (l2a + l2b)").as("rouge2_f_ppm"),
        expr("CASE WHEN ov1 = 0 OR ov2 = 0 THEN 0L ELSE CAST(floor(" +
          "(CASE WHEN l1b >= l1a THEN 1.0" +
          " ELSE exp(1.0 - CAST(l1a AS DOUBLE) / CAST(l1b AS DOUBLE))" +
          " END)" +
          " * sqrt((CAST(ov1 AS DOUBLE) / l1b)" +
          " * (CAST(ov2 AS DOUBLE) / l2b))" +
          " * 1000000.0 + 0.5) AS BIGINT) END").as("bleu2_ppm"))
      .orderBy($"ia", $"ib")
  }
}
