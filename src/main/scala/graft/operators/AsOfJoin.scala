package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the single most recent
  * right row whose time is <= the left row's time, per key — the
  * point-in-time lookup every event/feature pipeline needs (trade-vs-
  * quote, click attribution, feature-as-of-label-time). The reference
  * has no such operator; this is part of the 100 TB extension surface.
  *
  * Spark-first design — NOT a join at all physically. A naive SQL
  * formulation (`l JOIN r ON key AND r.t <= l.t` + argmax) explodes to
  * |L|x|R| per key before aggregating. Instead we run the classic
  * union-and-sweep plan:
  *
  *   1. tag left rows (1) and right rows (0), union by name;
  *   2. one hash shuffle on the key (the ONLY shuffle);
  *   3. per key, sort by (t, tag) and sweep with
  *      `last(right_payload, ignoreNulls)` over rows UNBOUNDED
  *      PRECEDING..CURRENT — a running "latest right row seen";
  *   4. keep the left rows.
  *
  * Cost is sort-within-partition + one shuffle, independent of how many
  * right rows precede each left row. Right rows at exactly the left
  * time sort BEFORE the left row (tag 0 < 1) => inclusive `<=` match.
  * Ties among right rows at the same (key, t) resolve by the payload
  * struct's natural order (deterministic).
  *
  * At cluster scale both inputs shuffle-partition by the same key, so
  * skewed keys can be salted upstream (graft.functions.Skew) and AQE
  * handles stragglers; state per key is O(1) during the sweep.
  */
object AsOfJoin {

  /** @param keyCols     equi-join key column names (present in both)
    * @param leftTime    left event-time column name
    * @param rightTime   right event-time column name
    * @param rightPayload right columns to carry onto matched left rows
    * @param prefix      prefix for the attached right columns
    * @param toleranceSec if set, matches older than this many seconds
    *                     before the left time are nulled out
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      prefix: String = "asof_", toleranceSec: Option[Long] = None): DataFrame = {

    val payloadStruct = struct((rightTime +: rightPayload).map(col): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__tag"),
        payloadStruct.as("__r")): _*)
    val l = left.withColumn("__t", col(leftTime)).withColumn("__tag", lit(1))
      .withColumn("__r", lit(null).cast(r.schema("__r").dataType))

    val sweep = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(sweep))
      .filter(col("__tag") === 1)

    val inTol: Column = toleranceSec match {
      case Some(tol) =>
        // cast handles TIMESTAMP_NTZ inputs; the tz offset cancels in
        // the difference
        unix_micros(col(leftTime).cast("timestamp")) -
          unix_micros(col("__m").getField(rightTime).cast("timestamp")) <=
          tol * 1000000L
      case None => lit(true)
    }
    val m = when(col("__m").isNotNull && inTol, col("__m"))

    val attached = (rightTime +: rightPayload).foldLeft(matched) { (df, c) =>
      df.withColumn(prefix + c, m.getField(c))
    }
    attached.drop("__t", "__tag", "__r", "__m")
  }
}
