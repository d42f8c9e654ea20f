package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic GLOBAL row numbering without a single-partition
  * window.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY moves the
  * entire dataset through ONE task — the canonical anti-pattern a
  * 100 TB sort-rank job cannot survive (WindowExec even logs a
  * warning). The scalable layout is the two-phase zip: range-partition
  * by the sort key, sort within partitions, count per partition, then
  * assign rank = partition offset + local index. Partition boundaries
  * come from sampling and are NOT deterministic — but the rank IS,
  * because the key order is total: every row's rank equals its
  * position in the global order regardless of where boundaries fall.
  *
  * This is the documented case for dropping to the RDD layer
  * (genuine per-partition imperative logic): `zipWithIndex` performs
  * exactly the count-then-offset passes described above.
  *
  * @param df       input
  * @param sortCols a TOTAL order (include a tiebreaker id column —
  *                 duplicate sort keys would make ranks run-dependent)
  * @param rankCol  output column name, 1-based contiguous ranks
  */
object GlobalRank {

  def withRank(df: DataFrame, sortCols: Seq[Column],
      rankCol: String = "rank", partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }
}
