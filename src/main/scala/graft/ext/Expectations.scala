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
}
