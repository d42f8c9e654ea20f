package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.queries.{Extended12, Tables}

/** Round-8 fourth batch (q156–q157): oracle hash-parity is the gate;
  * these pin the ln guard band and the peel-cascade invariants.
  */
class Extended12Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q156: every scaled PMI sits >=1e-3 from an integer boundary") {
    import spark.implicits._
    // same residual-risk guard as q130: floor(ln(...)·1e6) must not sit
    // within cross-libm ulp distance of an integer, or hash parity is
    // platform luck. Replay the formula for every emitted row.
    val docs = Tables.load(spark, dir, "documents")
    val nDocs = docs.count().toDouble
    val tk = docs.select($"doc_id", $"source",
        explode(array_distinct(TextFns.tokens($"text"))).as("tok"))
      .distinct().as[(Long, String, String)].collect()
    val nT = tk.groupBy(_._3).view.mapValues(_.map(_._1).distinct.size).toMap
    val nS = docs.groupBy($"source").agg(count(lit(1)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Extended12.q156(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, tok, nTs) = (r.getAs[String]("source"),
        r.getAs[String]("tok"), r.getAs[Long]("n_ts"))
      val scaled = (math.log(nTs * nDocs.toLong.toDouble) -
        math.log((nT(tok).toLong * nS(src)).toDouble)) * 1e6
      val frac = scaled - math.floor(scaled)
      assert(math.min(frac, 1.0 - frac) > 1e-3,
        f"$src/$tok PMI $scaled%.6f too close to a floor boundary")
      assert(r.getAs[Long]("pmi_micro") === math.floor(scaled).toLong)
    }
  }

  test("q158: rank-sum AUC == brute-force pairwise comparison") {
    import spark.implicits._
    val row = Extended12.q158(spark, dir).collect().head
    // the DEFINITION: over all (pos, neg) pairs, wins + half-ties
    val data = Tables.load(spark, dir, "documents")
      .select($"n_chars", ($"lang" === "en").as("pos"))
      .as[(Long, Boolean)].collect()
    val posScores = data.filter(_._2).map(_._1)
    val negScores = data.filterNot(_._2).map(_._1)
    var wins2 = 0L // doubled to keep half-ties integer
    for (p <- posScores; n <- negScores) {
      if (p > n) wins2 += 2L else if (p == n) wins2 += 1L
    }
    assert(row.getAs[Long]("np") === posScores.length.toLong)
    assert(row.getAs[Long]("nn") === negScores.length.toLong)
    assert(row.getAs[Long]("u2") === wins2, "U statistic (doubled)")
    assert(row.getAs[Long]("auc_ppm") ===
      wins2 * 1000000L / (2L * posScores.length * negScores.length))
  }

  test("q157: peel cascades, counts conserve round over round") {
    import spark.implicits._
    val rows = Extended12.q157(spark, dir).collect()
      .sortBy(_.getAs[Long]("round"))
    assert(rows.length === 3)
    val n = rows.map(_.getAs[Long]("n_nodes"))
    val rm = rows.map(_.getAs[Long]("n_removed"))
    // next round's node universe = survivors that kept an edge — so it
    // can only be <= previous survivors
    assert(n(1) <= n(0) - rm(0) && n(2) <= n(1) - rm(1))
    // round-1 removals replay the raw degree distribution
    val op = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
    val e0 = op.as("a").join(op.as("b"), $"a.o" === $"b.o" && $"a.p" < $"b.p")
      .select($"a.p".as("u"), $"b.p".as("v")).distinct()
    val lowDeg = e0.select(explode(array($"u", $"v")).as("nn"))
      .groupBy($"nn").agg(count(lit(1)).as("d"))
      .filter($"d" < 100).count()
    assert(rm(0) === lowDeg)
  }
}
