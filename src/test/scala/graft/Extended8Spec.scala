package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.queries.{Extended8, Tables}

/** Fifth round-7 batch (q138–q140): oracle hash-parity is the gate;
  * these prove the algorithmic claims (prefix-filter completeness,
  * interpolation bounds, skyline = brute-force domination).
  */
class Extended8Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q138: prefix-filter join ≡ brute-force Jaccard join (no false negatives)") {
    import spark.implicits._
    val sets = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        array_distinct(
          TextFns.ngramsFromTokens(TextFns.tokens($"text"), 3)).as("toks"))
    val brute = sets.as("a")
      .join(sets.as("b"), $"a.doc_id" < $"b.doc_id")
      .withColumn("inter", size(array_intersect($"a.toks", $"b.toks")).cast("long"))
      .withColumn("n_union",
        (size($"a.toks") + size($"b.toks")).cast("long") - $"inter")
      .filter($"inter" * 2 >= $"n_union")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        $"inter", $"n_union")
      .orderBy($"doc_a", $"doc_b")
      .collect()
    assert(Extended8.q138(spark, dir).collect() === brute)
  }

  test("q139: knowns preserved, gaps bounded by their neighbors, calendar gapless") {
    import spark.implicits._
    val rows = Extended8.q139(spark, dir).collect()
    val days = rows.map(_.getAs[java.sql.Date]("day").toLocalDate)
    assert(days.length ===
      java.time.temporal.ChronoUnit.DAYS.between(days.head, days.last) + 1)
    // every filled value sits inside [min, max] of the nearest knowns on
    // either side (linear interpolation can't overshoot)
    val vals = rows.map(r => (r.getAs[Int]("known"), r.getAs[Long]("value_cents")))
    val knownIdx = vals.zipWithIndex.collect { case ((1, v), i) => (i, v) }
    assert(knownIdx.nonEmpty, "sparse filter must keep some days")
    assert(knownIdx.size < vals.length, "sparse filter must drop some days")
    vals.zipWithIndex.filter(_._1._1 == 0).foreach { case ((_, v), i) =>
      val before = knownIdx.filter(_._1 < i).map(_._2).lastOption
      val after = knownIdx.filter(_._1 > i).map(_._2).headOption
      val bounds = Seq(before, after).flatten
      assert(v >= bounds.min && v <= bounds.max,
        s"interpolated $v outside neighbor bounds $bounds at row $i")
    }
  }

  test("q140: skyline is exactly the non-dominated point set") {
    import spark.implicits._
    val pts = Tables.load(spark, dir, "events")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("x"),
        sum(floor($"value" * 100 + 0.5).cast("long")).as("y"))
      .groupBy($"x").agg(max($"y").as("y"))
      .as[(Long, Long)].collect().toSet
    val frontier = pts.filter { case (x, y) =>
      !pts.exists { case (qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
    }
    val got = Extended8.q140(spark, dir).collect()
      .map(r => (r.getAs[Long]("n_events"), r.getAs[Long]("spend_cents"))).toSet
    assert(got === frontier)
  }
}
