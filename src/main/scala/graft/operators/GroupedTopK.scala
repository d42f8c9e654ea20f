package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group top-k without the per-group single-task sort.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY …) <= k` with a
  * LOW-cardinality g (a handful of corpus sources) sorts each group's
  * ENTIRE extent in one task — at 100 TB with 4 sources, 4 tasks carry
  * the whole table. The scalable layout is the salted two-phase
  * reduction the [[GlobalRank]] family applies to rank/prefix-sum:
  *
  *  1. rank within (g, salt) — salts-way parallel per group, each cell
  *     ~1/salts of the group — and keep k per cell;
  *  2. rank the ≤ salts·k survivors per group (bounded input, so the
  *     single-task-per-group window is safe: its input no longer
  *     scales with the data) and keep k.
  *
  * Exactness: the global top-k under a total order is contained in the
  * union of per-cell top-ks, whatever the cell assignment — phase 1
  * can only drop rows that at least k cell-mates already beat. With
  * duplicate rows (several rows equal under the total order) any k of
  * them are interchangeable, so a deterministic-but-arbitrary salt
  * keeps results stable run to run.
  *
  * @param keyCols   group columns (window PARTITION BY; null keys
  *                  group together)
  * @param orderCols a TOTAL order within each group (include a
  *                  tiebreaker id column — duplicate sort keys would
  *                  make membership of the k-th rank run-dependent)
  * @param k         rows kept per group
  * @param rankCol   output rank column, long, 1..k per group
  * @param salts     phase-1 fan-out per group; 0 = the session's
  *                  shuffle parallelism
  */
object GroupedTopK {

  /** An orderCols entry may carry a sort direction (`$"x".desc`) —
    * hashing needs the CHILD expression, not the Unevaluable ordering
    * wrapper. */
  private def stripSortOrder(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.stripSortOrder(c)

  def topK(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
      k: Int, rankCol: String = "rk", salts: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(keyCols.nonEmpty, "topK needs group columns — for global" +
      " top-k use orderBy(...).limit(k), which Spark already executes" +
      " as a distributed TakeOrdered")
    val s = if (salts > 0) salts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val saltCol = "__gtk_salt"
    // deterministic per-row cell: hash of (key, order) only — the
    // contract makes that a row identity (orderCols include a
    // tiebreaker), so hashing the remaining payload columns (KB-scale
    // text on curation frames) would buy nothing and pay per-byte.
    // No rand(): run-independence.
    val saltOn = keyCols.map(col) ++ orderCols.map(stripSortOrder)
    val salted = df.withColumn(saltCol,
      pmod(xxhash64(struct(saltOn: _*)), lit(s.toLong)))
    val w1 = Window
      .partitionBy((keyCols :+ saltCol).map(col): _*)
      .orderBy(orderCols: _*)
    val survivors = salted
      .withColumn("__gtk_r1", row_number().over(w1))
      .filter(col("__gtk_r1") <= k)
      .drop(saltCol, "__gtk_r1")
    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    survivors
      .withColumn(rankCol, row_number().over(w2).cast("long"))
      .filter(col(rankCol) <= k)
  }
}
