package graft

import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.functions._

import graft.queries.{Extended5, Tables}

/** Round-7 extension surface: bloom runtime-filter join, context-window
  * chunking, temperature mix, transition matrix, epoch shuffle,
  * multi-band LSH. Correctness vs the DuckDB oracle is the gate
  * (q120–q125); these specs pin the invariants the oracle can't see —
  * plan shape, sketch soundness, coverage/recall properties.
  */
class Extended5Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  import org.apache.spark.sql.graft.Bridge

  test("bloom_agg/might_contain: no false negatives over inserted keys") {
    import spark.implicits._
    val keys = (1L to 5000L).filter(_ % 7 == 0).toDF("k")
    keys.createOrReplaceTempView("bloom_keys_spec")
    val missed = spark.sql(
      """SELECT count(*) AS miss FROM bloom_keys_spec
        |WHERE NOT might_contain(
        |  (SELECT bloom_agg(xxhash64(k)) FROM bloom_keys_spec),
        |  xxhash64(k))""".stripMargin).head().getLong(0)
    assert(missed === 0L) // a bloom filter can false-positive, never false-negative
  }

  test("q120: the physical plan prefilters the fact scan with BloomFilterMightContain") {
    val plan = Extended5.q120(spark, dir).queryExecution.sparkPlan
    val bloomFilters = plan.collect {
      case f: FilterExec if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) => f
    }
    assert(bloomFilters.nonEmpty,
      "expected the bloom prefilter to survive optimization into a Filter over the lineitem scan")
  }

  test("q120: bloom prefilter + exact semi join ≡ plain semi join") {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
    val dim = Tables.load(spark, dir, "orders")
      .filter($"o_totalprice" > 400000).select($"o_orderkey")
    val expected = li.join(dim, li("l_orderkey") === dim("o_orderkey"), "left_semi")
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_items"),
        sum($"l_quantity").cast("long").as("sum_qty"))
      .orderBy($"l_orderkey")
      .collect()
    assert(Extended5.q120(spark, dir).collect() === expected)
  }

  test("q121: chunks cover every token, spaced by stride, full-size except the tail") {
    import spark.implicits._
    val chunks = Extended5.q121(spark, dir)
      .groupBy($"doc_id")
      .agg(
        min($"start_token").as("first_start"),
        max($"start_token" + $"n_tokens" - 1).as("covered_to"),
        max($"start_token").as("last_start"),
        count(lit(1)).as("n_chunks"))
    val toks = Tables.load(spark, dir, "documents")
      .select($"doc_id", size(graft.functions.TextFns.tokens($"text")).as("n"))
    val joined = chunks.join(toks, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val n = r.getAs[Int]("n").toLong
      assert(r.getAs[Long]("first_start") === 1L, s"doc ${r.get(0)}: first chunk must start at 1")
      assert(r.getAs[Long]("covered_to") >= n, s"doc ${r.get(0)}: tail tokens uncovered")
    }
  }

  test("q121: mid chunks are exactly chunkSize tokens; strides are uniform") {
    import spark.implicits._
    val bad = Extended5.q121(spark, dir)
      .withColumn("max_idx",
        max($"chunk_idx").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")))
      .filter(
        ($"chunk_idx" < $"max_idx" && $"n_tokens" =!= 32) ||
          ($"start_token" =!= $"chunk_idx" * 24 + 1))
      .count()
    assert(bad === 0L)
  }

  test("q125 multiband candidates are a superset of q20's single-band candidates") {
    val single = graft.queries.DocOps.q20(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Extended5.q125(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // any pair agreeing on all 4 hashes agrees on both 2-hash bands
    assert(single.subsetOf(multi))
  }

  test("q122: weights are monotone in char mass and the max source gets 1e6") {
    val rows = Extended5.q122(spark, dir).collect()
    val byChars = rows.sortBy(_.getAs[Long]("chars"))
    val weights = byChars.map(_.getAs[Long]("weight_ppm"))
    assert(weights.zip(weights.tail).forall { case (a, b) => a <= b })
    assert(weights.last === 1000000L)
    // temperature flattening: smallest source's weight share exceeds its raw share
    val sharePpm = byChars.map(_.getAs[Long]("share_ppm"))
    assert(weights.head.toDouble / weights.sum >
      sharePpm.head.toDouble / sharePpm.sum)
  }

  test("q123: ppm row probabilities sum to ~1e6 per prev_type") {
    import spark.implicits._
    val sums = Extended5.q123(spark, dir)
      .groupBy($"prev_type").agg(sum($"prob_ppm").as("s"), count(lit(1)).as("k"))
      .collect()
    sums.foreach { r =>
      val s = r.getAs[Long]("s")
      val k = r.getAs[Long]("k")
      // integer-floor division loses < 1 ppm per cell
      assert(s <= 1000000L && s > 1000000L - k)
    }
  }

  test("q124: each epoch is a permutation of doc_ids; epochs order differently") {
    import spark.implicits._
    val df = Extended5.q124(spark, dir)
    val all = Tables.load(spark, dir, "documents").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    val e0 = df.filter($"epoch" === 0)
    val e1 = df.filter($"epoch" === 1)
    assert(e0.select($"doc_id").collect().map(_.getLong(0)).toSet === all)
    assert(e1.select($"doc_id").collect().map(_.getLong(0)).toSet === all)
    // the shard-major order of the two epochs must differ (seeded by epoch)
    val o0 = e0.orderBy($"shard", $"position").select($"doc_id").collect().map(_.getLong(0)).toSeq
    val o1 = e1.orderBy($"shard", $"position").select($"doc_id").collect().map(_.getLong(0)).toSeq
    assert(o0 !== o1)
  }
}
