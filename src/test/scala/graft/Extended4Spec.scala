package graft

import org.apache.spark.sql.functions._

import graft.queries.Extended4

/** Invariants and plan contracts for the round-4 queries (the sf0.01
  * DuckDB oracle is the value gate; these pin semantics the oracle can't
  * see — decorrelation, null behavior, exactness vs built-ins, plan
  * shapes). Runs on sf0.001.
  */
class Extended4Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q106 lateral top-k: at most 3 orders per customer, sorted within") {
    val rows = Extended4.q106(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (_, os) =>
      assert(os.length <= 3)
      val prices = os.map(_._3)
      assert(prices.sameElements(prices.sortBy(-_)), "desc within customer")
    }
    // decorrelated: one Window rank, not a per-row loop
    val plan = Extended4.q106(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected decorrelated window plan:\n$plan")
  }

  test("q107 array ops: pos_sum is n(n+1)/2 of the token count") {
    val docs = graft.queries.Tables.load(spark, sf, "documents")
      .select($"doc_id", size(graft.functions.TextFns.tokens($"text")).as("n"))
    val got = Extended4.q107(spark, sf).select($"doc_id", $"pos_sum")
    val joined = got.join(docs, "doc_id")
      .filter($"pos_sum" =!= ($"n".cast("long") * ($"n" + 1).cast("long")) / 2)
    assert(joined.count() === 0)
  }

  test("q108 sufficient-statistics corr matches Spark's corr() built-in") {
    val got = Extended4.q108(spark, sf)
      .select($"event_type", $"corr_r", $"slope_r").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val ref = graft.queries.Tables.load(spark, sf, "events")
      .select($"event_type", hour($"ts".cast("timestamp")).cast("double").as("h"),
        $"value")
      .groupBy($"event_type")
      .agg(corr($"h", $"value").as("c"),
        covar_samp($"h", $"value").as("cov"), var_samp($"h").as("vh"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2) / r.getDouble(3))))
      .toMap
    ref.foreach { case (k, (c, slope)) =>
      // integer-millionth scaling of value loses < 1e-6 per row; corr is
      // scale-invariant so agreement is tight
      assert(math.abs(got(k)._1 - c) < 1e-4, s"$k corr ${got(k)._1} vs $c")
      assert(math.abs(got(k)._2 - slope) < 1e-3, s"$k slope")
    }
  }

  test("q109 try_* null semantics") {
    val out = Extended4.q109(spark, sf)
    // hour == 12 → division by zero → NULL, never Inf/error
    val ev = graft.queries.Tables.load(spark, sf, "events")
      .select($"event_id", hour($"ts".cast("timestamp")).as("h"))
    val joined = out.join(ev, "event_id")
    assert(joined.filter($"h" === 12 && $"per_off_hour".isNotNull).count() === 0)
    assert(joined.filter($"h" =!= 12 && $"per_off_hour".isNull).count() === 0)
    // event_type first chars are letters → try_cast yields NULL, not error
    assert(out.filter($"bad_num".isNotNull).count() === 0)
    // no event_type is 100 chars → always NULL
    assert(out.filter($"char100".isNotNull).count() === 0)
    assert(out.filter($"k_num".isNull).count() === 0)
  }

  test("q110 bitmap distinct == exact countDistinct") {
    val got = Extended4.q110(spark, sf)
      .select($"event_type", $"distinct_users").as[(String, Long)]
      .collect().toMap
    val exact = graft.queries.Tables.load(spark, sf, "events")
      .groupBy($"event_type").agg(countDistinct($"user_id").as("d"))
      .as[(String, Long)].collect().toMap
    assert(got === exact)
  }

  test("q111 BM25: df side broadcasts; scores positive and distinct-term-bounded") {
    val q = Extended4.q111(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"df/corpus sides must broadcast:\n$plan")
    q.collect().foreach { r =>
      assert(r.getLong(1) > 0L, "BM25 of matched docs is positive")
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 4L, "1..4 query terms")
    }
  }

  test("MergeInto: delete removes, update wins, insert adds, rest carried") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "st", "v")
    val ch = Seq((2L, "D", null.asInstanceOf[String], 0.0),
      (3L, "U", "c2", 33.0), (4L, "I", "d", 40.0))
      .toDF("k", "op", "st", "v")
    val out = graft.ext.MergeInto(base, ch, "k")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    assert(out === Map(1L -> (("a", 10.0)), 3L -> (("c2", 33.0)),
      4L -> (("d", 40.0))))
  }

  test("q114 CDC fingerprint: deleted keys gone, update/insert statuses present") {
    val got = Extended4.q114(spark, sf)
      .collect().map(r => r.getString(0)).toSet
    assert(got.contains("U") && got.contains("N"))
    // recompute the merged set's key residues directly through MergeInto
    val base = graft.queries.Tables.load(spark, sf, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val n0 = base.filter($"o_orderkey" % 10 === 0).count()
    assert(n0 > 0, "fixture must exercise deletes")
  }

  test("q112 map invariants: sq_sum ≥ n_distinct, rep_toks ⇔ n_rep") {
    Extended4.q112(spark, sf).collect().foreach { r =>
      val (rep, nRep, sq, nDist) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(5))
      assert(sq >= nDist, "each count² ≥ 1")
      assert((rep.isEmpty && nRep == 0L) || rep.split(" ").length == nRep)
    }
  }

  test("q115 pattern counts bounded by journey length") {
    Extended4.q115(spark, sf).collect().foreach { r =>
      val (n, funnel, vc) = (r.getLong(1), r.getBoolean(2), r.getLong(3))
      assert(vc <= n / 2, "non-overlapping 'vc' pairs")
      assert(!funnel || n >= 3, "funnel needs at least 3 events")
    }
  }

  test("q116 forward fill: ffill equals v on known rows, carries over gaps") {
    val rows = Extended4.q116(spark, sf).collect()
    rows.foreach { r =>
      if (!r.isNullAt(2))
        assert(r.getDouble(3) === r.getDouble(2), "known rows fill with themselves")
    }
    // nulls after a known value are filled; leading nulls stay null
    assert(rows.exists(r => r.isNullAt(2) && !r.isNullAt(3)),
      "at least one gap actually fills")
  }

  test("q117 HLL union stays within the error envelope (oracle asserts TRUE)") {
    Extended4.q117(spark, sf).collect().foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)} estimate out of bound")
      assert(r.getLong(2) >= 1L)
    }
  }

  test("q113 funnel stages are monotone and gaps positive") {
    val r = Extended4.q113(spark, sf).collect().head
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel must narrow: $v $c $p")
    assert(p == 0 || r.getLong(3) > 0L, "ordered stages imply positive gap")
  }
}
