package graft

import org.apache.spark.sql.functions._

import graft.operators.HashSplit
import graft.queries.{Extended10, Tables}

/** Round-8 second batch (q147–q150): oracle hash-parity is the
  * correctness gate; these pin the sketch/sample/cohort invariants the
  * oracle can't see.
  */
class Extended10Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q147: CMS estimate >= truth, and shard sketches MERGE exactly") {
    import spark.implicits._
    val rows = Extended10.q147(spark, dir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("true_cnt"),
        "count-min can only overcount")
      assert(r.getAs[Long]("overcount") ===
        r.getAs[Long]("est_cnt") - r.getAs[Long]("true_cnt"))
    }
    // mergeability — the property that makes the sketch a 100 TB tool:
    // cells built per shard then SUMMED equal the whole-corpus cells
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(graft.functions.TextFns.tokens($"text")).as("tok"))
      .select(explode(array(lit("a"), lit("b"))).as("salt"), $"tok")
      .withColumn("bucket", HashSplit.bucket(concat($"salt", $"tok"), 64))
      .groupBy($"salt", $"bucket").agg(count(lit(1)).as("cell"))
    val docs = Tables.load(spark, dir, "documents")
    val whole = cells(docs).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val merged = cells(docs.filter($"doc_id" % 2 === 0))
      .unionByName(cells(docs.filter($"doc_id" % 2 === 1)))
      .groupBy($"salt", $"bucket").agg(sum($"cell").as("cell")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged === whole, "sharded sketches must add cell-wise")
  }

  test("q148: exactly 5 per stratum, stable across partitionings") {
    import spark.implicits._
    val a = Extended10.q148(spark, dir).collect()
    val perLang = a.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    assert(perLang.values.forall(_ === 5), s"$perLang")
    // determinism: the sample ignores physical layout entirely
    val docs = Tables.load(spark, dir, "documents")
    val reparted = docs.repartition(13, $"n_chars")
    reparted.createOrReplaceTempView("docs_q148_reparted")
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    val b = reparted.select($"doc_id", $"lang", $"n_chars")
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"lang", $"rk", $"doc_id", $"n_chars")
      .orderBy($"lang", $"rk").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("q149: offset-0 row equals cohort size; offsets non-negative") {
    import spark.implicits._
    val rows = Extended10.q149(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("offset_wk") >= 0L))
    // every user appears in their own cohort week, so the offset-0 cell
    // is exactly the cohort's size
    val cohortSizes = Tables.load(spark, dir, "events")
      .select($"user_id",
        (floor(unix_timestamp($"ts") / 86400) / 7).cast("long").as("wk"))
      .groupBy($"user_id").agg(min($"wk").as("c"))
      .groupBy($"c").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(_.getAs[Long]("offset_wk") == 0L).foreach { r =>
      assert(r.getAs[Long]("n_users") ===
        cohortSizes(r.getAs[Long]("cohort_wk")))
    }
  }

  test("q150: pair counts bounded by unigram doc-counts; lift exact") {
    import spark.implicits._
    val rows = Extended10.q150(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 190, "at most C(20,2) pairs")
    val docs = Tables.load(spark, dir, "documents")
    val nDocs = docs.count()
    val uni = docs
      .select($"doc_id", explode(array_distinct(
        graft.functions.TextFns.tokens($"text"))).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("tok_a"), r.getAs[String]("tok_b"))
      assert(a < b, "canonical pair order")
      val nab = r.getAs[Long]("n_ab")
      assert(nab <= math.min(uni(a), uni(b)))
      assert(r.getAs[Long]("lift_ppm") ===
        nab * 1000000L * nDocs / (uni(a) * uni(b)))
    }
  }
}
