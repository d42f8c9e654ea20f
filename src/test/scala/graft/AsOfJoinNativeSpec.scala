package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.plans.{AsOfJoinExec, AsOfJoinNative}

/** The native merge-sweep as-of operator (logical node → strategy →
  * physical exec): golden results, equivalence with the union+window
  * formulation, plan shape, and tolerance. */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 1L, 100.0),
    ("A", ts("2024-01-01 10:05:00"), 2L, 101.0),
    ("A", ts("2024-01-01 10:10:00"), 3L, 102.0),
    ("B", ts("2024-01-01 10:02:00"), 4L, 200.0)
  ).toDF("sym", "qts", "qid", "price")

  private lazy val trades = Seq(
    ("A", ts("2024-01-01 10:04:59"), 11L),
    ("A", ts("2024-01-01 10:05:00"), 12L), // inclusive <=
    ("A", ts("2024-01-01 10:30:00"), 13L),
    ("B", ts("2024-01-01 10:01:00"), 14L), // no quote yet
    ("C", ts("2024-01-01 10:00:00"), 15L)  // key never quoted
  ).toDF("sym", "tts", "tid")

  test("native as-of join matches hand-checked goldens") {
    val out = AsOfJoinNative.backward(trades, quotes, Seq("sym"), "tts", "qts")
      .select($"tid", $"asof_qid", $"asof_price")
      .orderBy($"tid")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(out === Seq(
      (11L, Some(1L), Some(100.0)),
      (12L, Some(2L), Some(101.0)),
      (13L, Some(3L), Some(102.0)),
      (14L, None, None),
      (15L, None, None)))
  }

  test("native plan contains AsOfJoinExec (strategy fired)") {
    val df = AsOfJoinNative.backward(trades, quotes, Seq("sym"), "tts", "qts")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$physical")
    // sparkPlan, not executedPlan: AQE wraps the tree in AdaptiveSparkPlanExec
    assert(df.queryExecution.sparkPlan.collect {
      case e: AsOfJoinExec => e
    }.nonEmpty)
  }

  test("native tolerance nulls out stale matches") {
    val out = AsOfJoinNative.backward(trades, quotes, Seq("sym"), "tts", "qts",
        toleranceSec = Some(300))
      .select($"tid", $"asof_qid")
      .orderBy($"tid")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1))))
    assert(out === Seq(
      (11L, Some(1L)), (12L, Some(2L)), (13L, None),
      (14L, None), (15L, None)))
  }

  test("native == union+window formulation on the events table (self-source)") {
    val ev = graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("pid"), $"user_id", $"ts".as("pts"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id", $"value")

    val native = AsOfJoinNative.backward(purchases, clicks,
        Seq("user_id"), "pts", "ts")
      .select($"pid", $"asof_event_id", $"asof_ts", $"asof_value")
    val window = AsOfJoin.backward(purchases, clicks,
        Seq("user_id"), "pts", "ts", Seq("event_id", "value"))
      .select($"pid", $"asof_event_id".as("asof_event_id"),
        $"asof_ts", $"asof_value")
    assert(native.count() === purchases.count())
    assert(native.except(window).count() === 0)
    assert(window.except(native).count() === 0)
  }

  test("optimizer rule pushes LEFT filters below the as-of node, not right ones") {
    import graft.plans.AsOfJoinNode
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val joined = AsOfJoinNative.backward(trades, quotes, Seq("sym"), "tts", "qts")

    // left-side predicate: must land below the node
    val leftFiltered = joined.filter($"tid" > 12L)
    val planL = leftFiltered.queryExecution.optimizedPlan
    val nodeL = planL.collectFirst { case n: AsOfJoinNode => n }.get
    assert(nodeL.left.collectFirst { case f: LFilter => f }.nonEmpty,
      s"left filter not pushed:\n$planL")
    assert(planL.collectFirst { case f: LFilter
      if f.child.isInstanceOf[AsOfJoinNode] => f }.isEmpty,
      s"left filter still above the node:\n$planL")
    // and results are identical to filtering the unpushed output
    assert(leftFiltered.count() === 3)

    // right-side predicate: must STAY above (pushing would change which
    // quote is "latest")
    val rightFiltered = joined.filter($"asof_price" > 100.5)
    val planR = rightFiltered.queryExecution.optimizedPlan
    val nodeR = planR.collectFirst { case n: AsOfJoinNode => n }.get
    assert(nodeR.right.collectFirst { case f: LFilter => f }.isEmpty,
      s"right filter wrongly pushed:\n$planR")
    // trades 12, 13 match quotes 2 (101.0), 3 (102.0)
    assert(rightFiltered.select($"tid").collect().map(_.getLong(0)).sorted
      === Array(12L, 13L))
  }

  test("null keys and null times never match (SQL equi-join semantics)") {
    val l = Seq(
      (Option("A"), Option(ts("2024-01-01 10:06:00")), 1L),
      (Option.empty[String], Option(ts("2024-01-01 10:06:00")), 2L),
      (Option("A"), Option.empty[Timestamp], 3L)
    ).toDF("sym", "tts", "tid")
    val r = Seq(
      (Option("A"), Option(ts("2024-01-01 10:00:00")), 10L),
      (Option.empty[String], Option(ts("2024-01-01 09:00:00")), 20L),
      (Option("A"), Option.empty[Timestamp], 30L)
    ).toDF("sym", "qts", "qid")
    val out = AsOfJoinNative.backward(l, r, Seq("sym"), "tts", "qts")
      .select($"tid", $"asof_qid")
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
    // null-sym left row and null-tts left row stay unmatched; the
    // null-qts right row is never a valid match even for sym=A
    assert(out === Map(1L -> Some(10L), 2L -> None, 3L -> None))
  }

  test("exec output is UnsafeRow-safe under a direct Sort (no Project)") {
    import org.apache.spark.sql.graft.Bridge
    import graft.plans.{AsOfJoinNode, AsOfJoinStrategy}
    Bridge.addStrategy(spark, AsOfJoinStrategy)
    val renamed = quotes.select(
      quotes.columns.map(c => col(c).as("r_" + c)).toIndexedSeq: _*)
    val lPlan = Bridge.analyzed(trades)
    val rPlan = Bridge.analyzed(renamed)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).get
    val node = AsOfJoinNode(lPlan, rPlan,
      Seq(attr(lPlan, "sym")), Seq(attr(rPlan, "r_sym")),
      attr(lPlan, "tts"), attr(rPlan, "r_qts"), None)
    // Sort directly above the exec requires UnsafeRow input — a reused
    // JoinedRow would throw ClassCastException here
    val sorted = Bridge.ofRows(spark, node)
      .orderBy($"r_price".desc_nulls_last, $"tid")
      .select($"tid").collect().map(_.getLong(0))
    assert(sorted.length === 5)
    assert(sorted.take(3).toSeq === Seq(13L, 12L, 11L))
  }

  test("multi-column keys and empty right side") {
    val l = Seq(("a", 1, ts("2024-01-01 10:00:00"), 1L))
      .toDF("k1", "k2", "t", "id")
    val r = Seq.empty[(String, Int, Timestamp, Long)]
      .toDF("k1", "k2", "t", "rid")
    val out = AsOfJoinNative.backward(l, r, Seq("k1", "k2"), "t", "t")
    assert(out.count() === 1)
    assert(out.select("asof_rid").head().isNullAt(0))
  }
}
