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
}
