package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** The driver-gate surfaces themselves: entry rows>0, Verify.run dumps
  * every query + parseable oracle JSON, charShingles sanity. */
class VerifySpec extends SparkSpec {

  test("SparkEntry.entry returns rows on sf0.001 (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys line up") {
    // EVERY query is oracle-gated — q49's fixed-iteration k-means turned
    // out to be SQL-expressible after all (unrolled Lloyd CTEs), so the
    // rows-only escape hatch is closed. Keep it closed: a new query
    // without an oracle should be a conscious, documented exception.
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
    assert(SparkEntry.queries.size >= 119)
  }

  test("Verify.run dumps parquet per query and valid oracle_sql.json") {
    val out = tmpDir("verifyrun")
    Verify.run(spark, "/root/testdata/sf0.001", out)
    SparkEntry.queries.keys.foreach { name =>
      assert(Files.exists(Paths.get(out, name)), s"missing output for $name")
      assert(spark.read.parquet(s"$out/$name").columns.nonEmpty)
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(Files.readString(Paths.get(out, "oracle_sql.json")))
    assert(node.isObject)
    val keys = node.properties().asScala.map(_.getKey).toSet
    assert(keys === SparkEntry.oracleSql.keySet)
  }

  test("GraftSession registers vec_dot on an existing session") {
    val s = GraftSession.build(master = "local[4]", shufflePartitions = 4)
    val r = s.sql(
      "SELECT vec_dot(array(CAST(2 AS FLOAT)), array(CAST(3 AS FLOAT)))").head()
    assert(r.getDouble(0) === 6.0)
  }

  test("charShingles produces overlapping k-grams, short text keeps one") {
    import graft.functions.TextFns
    import spark.implicits._
    val out = Seq("abcde", "ab").toDF("t")
      .select(TextFns.charShingles($"t", 3).as("sh"))
      .collect().map(_.getSeq[String](0).toSeq)
    assert(out(0) === Seq("abc", "bcd", "cde"))
    assert(out(1) === Seq("ab"))
  }
}
