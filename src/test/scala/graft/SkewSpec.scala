package graft

import org.apache.spark.sql.functions._

import graft.functions.Skew

class SkewSpec extends SparkSpec {

  test("saltedJoin equals plain join on skewed data") {
    import spark.implicits._
    // 10k rows, 90% under one hot key
    val big = spark.range(10000)
      .select(when($"id" % 10 === 0, $"id" % 5 + 10).otherwise(lit(1L)).as("k"),
        $"id".as("v"))
    val dim = Seq((1L, "hot"), (10L, "a"), (11L, "b"), (12L, "c"),
      (13L, "d"), (14L, "e")).toDF("k", "name")

    val plain = big.join(dim, Seq("k"), "inner")
      .groupBy($"name").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(big, dim, "k", n = 8, "inner")
      .groupBy($"name").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("salt spreads a hot key over n buckets") {
    import spark.implicits._
    val hot = spark.range(1000).select(lit(1L).as("k"), $"id".as("v"))
    val buckets = hot.select(Skew.salt(8, $"v").as("s"))
      .distinct().count()
    assert(buckets === 8)
  }

  test("saltedCollectList preserves multiset of values per key") {
    import spark.implicits._
    val df = spark.range(100)
      .select(($"id" % 3).as("k"), $"id".as("v"))
    val out = Skew.saltedCollectList(df, "k", "v", n = 4)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Long](1).sorted).toMap
    val expect = (0L until 100L).groupBy(_ % 3).view
      .mapValues(_.toSeq.sorted).toMap
    assert(out === expect)
  }
}
