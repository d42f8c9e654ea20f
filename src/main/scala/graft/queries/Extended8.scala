package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Round-7 fifth batch:
  *
  *  - q138 prefix-filter set-similarity join (PPJoin's candidate rule):
  *    EXACT Jaccard ≥ 0.5 pairs with NO false negatives — the
  *    deterministic alternative to LSH (q20) when the pipeline needs
  *    provable completeness;
  *  - q139 linear-interpolation gap fill — the numeric step past
  *    LOCF (q116): missing days reconstructed from both neighbors,
  *    integer-exact;
  *  - q140 2-D skyline (Pareto frontier) via one sorted window pass —
  *    the O(n log n) plan for a query usually written as a quadratic
  *    NOT EXISTS (which is exactly what the oracle runs).
  */
object Extended8 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------------
  // q138 — prefix-filter similarity join (the PPJoin candidate rule)
  // over 3-gram shingle sets (q20/q21's near-dup unit): order each
  // doc's shingle SET by ascending document frequency (rarest first);
  // any pair with Jaccard ≥ t MUST share an element in the first
  // n - ceil(t·n) + 1 of both lists, so bucketing on prefix shingles
  // alone is a complete candidate generator. Candidates then verify
  // with the integer cross-multiplied test 2·|∩| ≥ |∪| — no float, no
  // false negative, unlike LSH (q20) which trades recall.
  //
  // Scale: the shuffle key is the PREFIX shingle — by construction the
  // rarest in each doc — so bucket sizes are df-bounded and frequent
  // shingles never become join keys (the opposite skew profile of a
  // naive token join, q130's hazard). Verification joins fetch the two
  // shingle sets by doc id (broadcast-able at dim sizes, shuffle join
  // at corpus scale).
  // (Implementation lives in TextDedup.similarityJoin — the reusable
  // operator with a rational threshold; this entry pins t = 1/2 over
  // 3-gram shingles. The materialize-once layout, the df-ordered
  // prefix keys and the codegen'd intersect count are documented
  // there; the 19.6 → 3.4 s optimization ladder in NOTES.md.)
  def q138(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.ext.TextDedup
      .similarityJoin(t(s, dir, "documents"), "text", "doc_id",
        ngram = 3, simNum = 1, simDen = 2)
      .orderBy($"doc_a", $"doc_b")
  }

  val q138Sql: String =
    s"""WITH d AS (
      |  SELECT doc_id, list_distinct(${DocOps.ngramsSql(3)}) AS toks
      |  FROM documents)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
      |  CAST(len(a.toks) + len(b.toks)
      |       - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_union
      |FROM d a JOIN d b ON a.doc_id < b.doc_id
      |WHERE 2 * len(list_intersect(a.toks, b.toks))
      |      >= len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))
      |ORDER BY doc_a, doc_b""".stripMargin

  // --------------------------------------------------------------------
  // q139 — linear-interpolation gap fill: a sparse daily revenue series
  // rebuilt over the full calendar; missing days get the straight line
  // between their known neighbors, integer-exact in cents:
  //   v(d) = (prev_v·(next_d − d) + next_v·(d − prev_d)) div (next_d − prev_d)
  // Edge days (no neighbor on one side) fall back LOCF/NOCB.
  //
  // Scale: the event aggregation is the distributed pass; the window
  // runs over the AGGREGATED day series (tiny — one row per day), so
  // the unpartitioned window is a non-issue at any corpus size.
  def q139(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val bounds = ev.agg(
      to_date(min($"ts")).as("d0"), to_date(max($"ts")).as("d1"))
    val cal = bounds
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val known = ev
      .filter($"event_type" === "purchase" && $"event_id" % 37 === 0)
      .groupBy(to_date($"ts").as("day"))
      .agg(sum(floor($"value" * 100 + 0.5).cast("long")).as("v"))
    val w = Window.orderBy($"day")
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val after = w.rowsBetween(1, Window.unboundedFollowing)
    cal.join(known, Seq("day"), "left")
      .withColumn("prev_v", last($"v", ignoreNulls = true).over(before))
      .withColumn("prev_d",
        last(when($"v".isNotNull, $"day"), ignoreNulls = true).over(before))
      .withColumn("next_v", first($"v", ignoreNulls = true).over(after))
      .withColumn("next_d",
        first(when($"v".isNotNull, $"day"), ignoreNulls = true).over(after))
      .withColumn("filled", coalesce($"v",
        expr("""(prev_v * datediff(next_d, day) + next_v * datediff(day, prev_d))
               | div datediff(next_d, prev_d)""".stripMargin),
        $"prev_v", $"next_v"))
      .select($"day", $"v".isNotNull.cast("int").as("known"),
        $"filled".as("value_cents"))
      .orderBy($"day")
  }

  val q139Sql: String =
    """WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
      |           FROM events),
      | cal AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      |         FROM b),
      | known AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
      |  FROM events
      |  WHERE event_type = 'purchase' AND event_id % 37 = 0
      |  GROUP BY 1),
      | series AS (
      |  SELECT cal.day, known.v,
      |    last_value(known.v IGNORE NULLS)
      |      OVER (ORDER BY cal.day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
      |    last_value(CASE WHEN known.v IS NOT NULL THEN cal.day END IGNORE NULLS)
      |      OVER (ORDER BY cal.day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_d,
      |    first_value(known.v IGNORE NULLS)
      |      OVER (ORDER BY cal.day ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v,
      |    first_value(CASE WHEN known.v IS NOT NULL THEN cal.day END IGNORE NULLS)
      |      OVER (ORDER BY cal.day ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_d
      |  FROM cal LEFT JOIN known ON cal.day = known.day)
      |SELECT day,
      |  CAST(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS known,
      |  CAST(coalesce(v,
      |    (prev_v * (next_d - day) + next_v * (day - prev_d))
      |      // (next_d - prev_d),
      |    prev_v, next_v) AS BIGINT) AS value_cents
      |FROM series ORDER BY day""".stripMargin

  // --------------------------------------------------------------------
  // q140 — 2-D skyline (Pareto frontier) of users over
  // (n_events, total spend): a point survives iff no other point is ≥
  // on both axes and > on one. The naive formulation is a quadratic
  // NOT-EXISTS anti join (exactly what the oracle runs); the engine
  // plan is O(n log n): dedupe points, keep each x's max y, then one
  // window sweep in x-descending order — a point is dominated iff a
  // strictly-larger x already achieved ≥ its y.
  //
  // Scale: the per-user aggregation is the distributed pass; the sweep
  // window runs over distinct (x, max y) points — already a reduced
  // set — and 2-D skylines are tiny in practice. (k-D generalizes by
  // grid-partition + per-cell skyline + merge.)
  def q140(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = t(s, dir, "events")
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("x"),
        sum(floor($"value" * 100 + 0.5).cast("long")).as("y"))
      .groupBy($"x").agg(max($"y").as("y"))
    val sweep = Window.orderBy($"x".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    pts
      .withColumn("best_y_larger_x", max($"y").over(sweep))
      .filter($"best_y_larger_x".isNull || $"best_y_larger_x" < $"y")
      .select($"x".as("n_events"), $"y".as("spend_cents"))
      .orderBy($"n_events")
  }

  val q140Sql: String =
    """WITH agg AS (
      |  SELECT user_id, count(*) AS x,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY user_id),
      | pts AS (SELECT x, max(y) AS y FROM agg GROUP BY x)
      |SELECT p.x AS n_events, p.y AS spend_cents
      |FROM pts p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts q
      |  WHERE q.x >= p.x AND q.y >= p.y AND (q.x > p.x OR q.y > p.y))
      |ORDER BY n_events""".stripMargin

  // --------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q138_prefix_filter_join" -> (q138 _),
    "q139_linear_interpolation" -> (q139 _),
    "q140_skyline" -> (q140 _))

  val oracles: Map[String, String] = Map(
    "q138_prefix_filter_join" -> q138Sql,
    "q139_linear_interpolation" -> q139Sql,
    "q140_skyline" -> q140Sql)
}
