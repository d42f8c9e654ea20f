package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract expectation gates — the validation report a training
  * pipeline runs BEFORE spending cluster-hours on a corpus: null
  * discipline, key uniqueness, derived-column consistency, domain
  * membership, vector hygiene. The point of the operator (vs a pile
  * of ad-hoc counts) is the scan contract: however many expectations
  * a table carries, the table is scanned ONCE — every check is a
  * conditional sum in the same aggregation, and only the bounded
  * (check × 1) report ever leaves the executors.
  */
object Expectations {

  /** Evaluate expectation groups, one scan per frame.
    *
    * @param groups (table label, frame, (check name, violation
    *               predicate)*) — a row VIOLATES a check when its
    *               predicate is true (NULL-safe: a NULL predicate
    *               counts as a violation, since an expectation that
    *               cannot be evaluated is not met)
    * @return one row per check: check (table.name), n_checked,
    *         n_violations, pass (1/0), ordered by check
    */
  def report(groups: Seq[(String, DataFrame, Seq[(String, Column)])])
      : DataFrame = {
    require(groups.nonEmpty && groups.forall(_._3.nonEmpty),
      "need at least one expectation per group")
    groups.map { case (tbl, df, checks) =>
      // coalesce the empty-table sum: a 0-row frame has 0 violations
      // (every check PASSES, with n_checked = 0 visible for callers
      // that additionally gate on non-emptiness) — without it the
      // report would read n_violations = NULL, pass = 0: a "failure"
      // with no violation to point at
      val aggs = count(lit(1)).as("__n") +: checks.map {
        case (nm, pred) =>
          coalesce(sum(when(coalesce(pred, lit(true)), 1L).otherwise(0L)),
            lit(0L)).as(nm)
      }
      df.agg(aggs.head, aggs.tail: _*)
        .select(lit(tbl).as("tbl"), col("__n").as("n_checked"),
          explode(map(checks.flatMap { case (nm, _) =>
            Seq(lit(nm), col(nm))
          }: _*)).as(Seq("check_name", "n_violations")))
    }.reduce(_ unionByName _)
      .select(
        concat_ws(".", col("tbl"), col("check_name")).as("check"),
        col("n_checked"), col("n_violations"),
        when(col("n_violations") === 0L, 1L).otherwise(0L).as("pass"))
      .orderBy(col("check"))
  }

  /** The built-in data contract for a CLEANED rides batch (the
    * reference's load path schema — uid/bike_number/start_time/
    * end_time/duration after RideTransform): the gate
    * `cli.Main load-checked` runs BEFORE appending to the store, so a
    * malformed export fails the job loudly instead of spending
    * cluster-hours materializing metrics over garbage. One scan for
    * the row checks plus the bounded distinct-count uniqueness row
    * (the q271 pattern).
    *
    * Checks: uid present, rental timestamp parsed, bike id present,
    * duration non-negative when present, return-before-rental
    * impossible, and in-batch uid uniqueness.
    */
  def rideContract(cleaned: DataFrame): DataFrame = {
    val rows = report(Seq(("rides", cleaned, Seq(
      "uid_null" -> col("uid").isNull,
      "start_time_null" -> col("start_time").isNull,
      "bike_number_null" ->
        (col("bike_number").isNull ||
          length(trim(col("bike_number"))) === 0),
      "duration_negative" ->
        (col("duration").isNotNull && col("duration") < 0),
      "end_before_start" ->
        (col("start_time").isNotNull && col("end_time").isNotNull &&
          col("end_time") < col("start_time"))))))
    val uniq = cleaned
      .agg(count(lit(1)).as("n"),
        count_distinct(col("uid")).as("d"),
        coalesce(sum(when(col("uid").isNull, 1L).otherwise(0L)), lit(0L))
          .as("nulls"))
      // duplicates among NON-NULL uids: countDistinct skips NULLs, so
      // subtract the null count too — a NULL uid is the uid_null
      // check's violation, not a duplicate of every other NULL
      .select(lit("rides.uid_duplicate").as("check"),
        col("n").as("n_checked"),
        (col("n") - col("d") - col("nulls")).as("n_violations"))
      .select(col("check"), col("n_checked"), col("n_violations"),
        when(col("n_violations") === 0L, 1L).otherwise(0L).as("pass"))
    rows.unionByName(uniq).orderBy(col("check"))
  }
}
