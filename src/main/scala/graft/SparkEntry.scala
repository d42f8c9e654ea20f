package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in `graft.queries.*` grouped by surface:
  *  - [[graft.queries.Core]]: the reference's relational operator
  *    inventory (SURVEY.md §2) over the synthetic TPC-H-ish tables.
  *  - [[graft.queries.DocOps]]: large-scale training-data-pipeline
  *    operators (dedup, similarity, text analysis) over documents /
  *    embeddings.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Core.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Core.queries ++ graft.queries.DocOps.queries ++
      graft.queries.Extended.queries ++ graft.queries.Extended3.queries ++
      graft.queries.Extended4.queries ++ graft.queries.Extended5.queries ++
      graft.queries.Extended6.queries ++ graft.queries.Extended7.queries ++
      graft.queries.Extended8.queries ++
      graft.queries.Extended9.queries ++
      graft.queries.Extended10.queries ++
      graft.queries.Extended11.queries ++
      graft.queries.Extended12.queries ++
      graft.queries.Extended13.queries ++
      graft.queries.Extended14.queries ++
      graft.queries.Extended15.queries ++
      graft.queries.Extended16.queries ++
      graft.queries.Extended17.queries ++
      graft.queries.Extended18.queries ++
      graft.queries.Extended19.queries ++
      graft.queries.Extended20.queries ++
      graft.queries.Extended21.queries ++
      graft.queries.Extended22.queries ++
      graft.queries.Extended23.queries ++
      graft.queries.Extended24.queries ++
      graft.queries.Extended25.queries ++
      graft.queries.Extended26.queries ++
      graft.queries.Extended27.queries ++
      graft.queries.Extended28.queries ++
      graft.queries.Extended29.queries ++
      graft.queries.Extended30.queries ++
      graft.queries.Extended31.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Core.oracles ++ graft.queries.DocOps.oracles ++
      graft.queries.Extended.oracles ++ graft.queries.Extended3.oracles ++
      graft.queries.Extended4.oracles ++ graft.queries.Extended5.oracles ++
      graft.queries.Extended6.oracles ++ graft.queries.Extended7.oracles ++
      graft.queries.Extended8.oracles ++
      graft.queries.Extended9.oracles ++
      graft.queries.Extended10.oracles ++
      graft.queries.Extended11.oracles ++
      graft.queries.Extended12.oracles ++
      graft.queries.Extended13.oracles ++
      graft.queries.Extended14.oracles ++
      graft.queries.Extended15.oracles ++
      graft.queries.Extended16.oracles ++
      graft.queries.Extended17.oracles ++
      graft.queries.Extended18.oracles ++
      graft.queries.Extended19.oracles ++
      graft.queries.Extended20.oracles ++
      graft.queries.Extended21.oracles ++
      graft.queries.Extended22.oracles ++
      graft.queries.Extended23.oracles ++
      graft.queries.Extended24.oracles ++
      graft.queries.Extended25.oracles ++
      graft.queries.Extended26.oracles ++
      graft.queries.Extended27.oracles ++
      graft.queries.Extended28.oracles ++
      graft.queries.Extended29.oracles ++
      graft.queries.Extended30.oracles ++
      graft.queries.Extended31.oracles
}
