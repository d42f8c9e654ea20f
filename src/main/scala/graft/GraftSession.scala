package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: the configuration every graft entry point
  * uses, in one place.
  *
  *  - `spark.sql.shuffle.partitions` sized to the core count (not the
  *    200 default — on local[32] that's 6× task overhead for nothing;
  *    on a real cluster set it to 2–3× total cores or rely on AQE
  *    coalescing, which stays enabled);
  *  - UTC session timezone (ride timestamps are zone-less local strings;
  *    status timestamps carry explicit offsets — see SURVEY.md §7.4.8);
  *  - GraftExtensions injected so `vec_dot` & co. work from plain SQL.
  */
object GraftSession {

  def build(
      master: String = sys.env.getOrElse("SPARK_MASTER", "local[*]"),
      shufflePartitions: Int =
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName: String = "graft"
  ): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // push MAX/MIN/COUNT without filters down to parquet footer
      // statistics (exact for primitive columns — results unchanged):
      // the monitor replay gate reads max(batch_id) over the whole
      // state parquet per merge, which this turns from a full state
      // scan into a footer read — O(files), not O(rows) (r18)
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // getOrCreate may have returned a pre-existing session whose builder
    // ran without our extensions — register the functions directly too.
    graft.plans.GraftExtensions.register(spark)
    spark
  }
}
