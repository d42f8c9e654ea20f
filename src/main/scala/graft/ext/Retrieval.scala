package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion — the glue between the lexical ([[Index]]
  * BM25) and vector (brute/LSH/IVF ANN) rankers: reciprocal rank
  * fusion (Cormack/Clarke/Buettcher, SIGIR 2009), the
  * score-distribution-free combiner RAG stacks default to because BM25
  * nanos and cosine basis points share no scale.
  *
  * RRF(doc) = Σ_lists 1/(k₀ + rank(doc)) — here in exact NANO units:
  * `10⁹ div (k₀ + rank)` per list (exact positive integer division on
  * every engine), summed as BIGINT, so fused scores are bit-identical
  * cross-engine and aggregation-order-proof (the q111 doctrine).
  *
  * Scale: inputs are ALREADY-bounded top-k ranking frames (each ranker
  * bounds its own output — TakeOrderedAndProject for BM25, the ANN
  * ladder for vectors), so fusion operates on lists-of-k rows: the
  * rank window, union, and final agg all touch ≤ Σkᵢ rows regardless
  * of corpus size. The corpus-sized work lives inside the rankers.
  */
object Retrieval {

  /** Fuse ranked lists by RRF. Each input frame must carry `idCol` and
    * `scoreCols` (score desc = better); ranks are assigned here
    * 1-based in (score desc, id asc) order — deterministic ties — so
    * callers pass RAW ranker output without pre-ranking.
    *
    * @param rankings  (name, frame) per ranker; the name labels the
    *                  per-list rank column `rank_<name>` in the output
    * @param k0        the RRF smoothing constant (60 in the paper)
    * @return (id, rrf_nano, n_lists, rank_<name>...) sorted best-first
    *         (rrf_nano desc, id asc); docs appearing in ANY list appear
    *         once, absent ranks are null
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], idCol: String,
      scoreCol: String, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k0 >= 0, s"k0 must be >= 0, got $k0")
    val contribs = rankings.map { case (name, df) =>
      // bounded input ⇒ the global rank window is a lists-of-k sort,
      // not a corpus sort (contract documented above)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col(scoreCol).desc, col(idCol).asc)
      df.select(col(idCol).as("id"), col(scoreCol))
        .withColumn("rank", row_number().over(w).cast("long"))
        .select(col("id"), lit(name).as("list"), col("rank"),
          expr(s"1000000000 div ($k0 + rank)").as("c"))
    }
    val aggCols = Seq(count(lit(1)).as("n_lists")) ++
      rankings.map { case (name, _) =>
        max(when(col("list") === name, col("rank"))).as(s"rank_$name")
      }
    contribs.reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(sum(col("c")).as("rrf_nano"), aggCols: _*)
      .orderBy(col("rrf_nano").desc, col("id").asc)
  }
}
