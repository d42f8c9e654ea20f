package graft

import org.apache.spark.sql.functions._

/** Salted two-phase grouped top-k == the windowed form, row for row,
  * at several salt fan-outs; null keys group; the executed plan never
  * windows on the bare low-cardinality key over unbounded input.
  */
class GroupedTopKSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("topK == windowed row_number <= k at any salt count") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = graft.queries.Tables.load(spark, dir, "documents")
      .select($"source", $"lang", $"doc_id", $"n_chars")
    val w = Window.partitionBy($"source", $"lang")
      .orderBy($"n_chars".desc, $"doc_id".asc)
    val want = docs
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .collect().map(r => (r.getLong(2), r.getAs[Long]("rk"))).toMap
    for (salts <- Seq(1, 4, 64)) {
      val got = graft.operators.GroupedTopK
        .topK(docs, Seq("source", "lang"),
          Seq($"n_chars".desc, $"doc_id".asc), k = 3, salts = salts)
        .collect().map(r => (r.getLong(2), r.getAs[Long]("rk"))).toMap
      assert(got === want, s"salts=$salts")
    }
  }

  test("null keys group together; k larger than a group returns the whole group") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, Some("a"), 10L), (2L, Some("a"), 20L),
      (3L, None, 5L), (4L, None, 7L), (5L, Some("b"), 1L))
      .toDF("id", "k", "v")
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 10)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("rk")).toMap
    val got = graft.operators.GroupedTopK
      .topK(df, Seq("k"), Seq($"v".desc, $"id".asc), k = 10, salts = 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("rk")).toMap
    assert(got === want)
  }

  test("phase-1 window partitions on (key, salt), never the bare key over raw input") {
    import spark.implicits._
    val docs = graft.queries.Tables.load(spark, dir, "documents")
      .select($"source", $"doc_id", $"n_chars")
    val plan = graft.operators.GroupedTopK
      .topK(docs, Seq("source"), Seq($"n_chars".desc, $"doc_id".asc),
        k = 3, salts = 8)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.length === 2, "two-phase form")
    // innermost window (phase 1) must carry the salt in its partition
    // spec — that is what spreads a low-cardinality group over tasks
    val phase1 = windows.last
    assert(phase1.partitionSpec.length === 2,
      s"phase-1 partition spec must be (key, salt): ${phase1.partitionSpec}")
  }

  test("weightedSample parity survives the salted top-k rewrite") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // the CurationOpsSpec brute-force parity pins VALUES; this pins the
    // windowed-form row identity at a salt count above the group count
    val docs = graft.queries.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source",
        ($"n_chars" % 4 + 1).cast("long").as("w"))
    val got = graft.ext.TrainPrep
      .weightedSample(docs, "doc_id", "source", "w", k = 5)
      .select($"source", $"rk", $"doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val expanded = docs.filter($"w" >= 1)
      .withColumn("__j", explode(expr("sequence(1, w)")))
      .withColumn("__h",
        conv(substring(md5(concat($"doc_id".cast("string"), lit("#"),
          $"__j".cast("string"))), 1, 8), 16, 10).cast("long"))
      .groupBy($"source", $"doc_id", $"w")
      .agg(max($"__h").as("key"))
    val w2 = Window.partitionBy($"source")
      .orderBy($"key".desc, $"doc_id".asc)
    val want = expanded
      .withColumn("rk", row_number().over(w2).cast("long"))
      .filter($"rk" <= 5)
      .collect().map(r => (r.getString(0), r.getAs[Long]("rk")) ->
        r.getAs[Long]("doc_id")).toMap
    assert(got === want)
  }
}
