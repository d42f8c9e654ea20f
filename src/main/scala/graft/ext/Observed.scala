package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Pipeline observability via `Dataset.observe`: attach named aggregate
  * metrics to a plan and read them AFTER an action, without a second
  * scan — at 100 TB a separate "count the nulls we wrote" job doubles
  * the cost; observed metrics ride along with the write for free
  * (they are computed by an accumulator-backed aggregate inside the
  * same physical plan).
  *
  * The canonical use: a load job observes (rows, null-keys, dup-keys)
  * while writing, then VALIDATES the batch after the action and
  * aborts/alerts on contract violations — the write-audit-publish
  * pattern with the audit fused into the write.
  */
object Observed {

  /** Attach metrics; returns the instrumented frame plus the handle to
    * read after an action completes. Note: DISTINCT aggregates are
    * rejected inside observed metrics (CollectMetrics analysis rule) —
    * use `approx_count_distinct` for cardinality audits. */
  def withMetrics(df: DataFrame, name: String,
      metrics: Seq[Column]): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "observe needs at least one metric")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Run `action` on the instrumented frame and return its observed
    * metric row as a name→value map. */
  def runAudited[T](df: DataFrame, name: String, metrics: Seq[Column])(
      action: DataFrame => T): (T, Map[String, Any]) = {
    val (instrumented, obs) = withMetrics(df, name, metrics)
    val result = action(instrumented)
    (result, obs.get)
  }
}
