package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Native FloatVectorDot vs the higher-order-function reference. */
class VectorExprSpec extends SparkSpec {

  test("native dot matches zip_with/aggregate dot on real embeddings") {
    val e = graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val both = e.crossJoin(broadcast(q))
      .select(
        VectorFns.dot(col("embedding"), col("qvec")).as("native"),
        VectorFns.dotHof(col("embedding"), col("qvec")).as("hof"))
      .withColumn("diff", abs(col("native") - col("hof")))
    val maxDiff = both.agg(max(col("diff"))).head().getDouble(0)
    assert(maxDiff < 1e-9, s"native vs HOF dot diverged by $maxDiff")
  }

  test("native dot null semantics: null array → null, empty → 0") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float]))
    ).toDF("a", "b")
    val rows = df.select(VectorFns.dot($"a", $"b")).collect()
    assert(rows(0).getDouble(0) === 11.0)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) === 0.0)
  }

  test("vec_dot is SQL-callable after GraftExtensions registration") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d").head()
    assert(r.getDouble(0) === 11.0)
  }

  test("argmin_l2: nearest centroid, first-min ties, short vector fails loudly") {
    import spark.implicits._
    val cb = Array(Array(0.0, 0.0), Array(1.0, 1.0))
    val got = Seq(Seq(0.9, 0.9), Seq(0.1, 0.0), Seq(0.5, 0.5)).toDF("v")
      .select(graft.plans.VectorExpressions.argminL2($"v", cb).as("c"))
      .collect().map(_.getInt(0))
    // (0.5, 0.5) is equidistant → FIRST (lowest) centroid id wins
    assert(got.toSeq === Seq(1, 0, 0))
    // a vector shorter than the codebook sub-dimension must throw, not
    // silently argmin over a truncated prefix (codegen path)
    val e = intercept[Exception] {
      Seq(Seq(0.5)).toDF("v")
        .select(graft.plans.VectorExpressions.argminL2($"v", cb)).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    assert(chain(e).contains("shorter than the codebook sub-dimension"),
      chain(e))
    // interpreted path enforces the same contract
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e2 = intercept[IllegalArgumentException] {
      graft.plans.ArgminL2(
        Literal.create(Seq(0.5), ArrayType(DoubleType)), cb).eval(null)
    }
    assert(e2.getMessage.contains("shorter than the codebook sub-dimension"))
  }

  test("codegen path is exercised (no fallback to interpreted)") {
    // force a plan and confirm it evaluates under wholestage codegen
    val e = graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = e.select(VectorFns.dot(col("embedding"), col("embedding")).as("d"))
    // '*(n)' prefixes mark WholeStageCodegen stages in the plan string
    val executed = plan.queryExecution.executedPlan.toString
    assert(executed.contains("*(1) Project [float_vector_dot"), executed)
    // and it actually runs
    assert(plan.agg(sum(col("d"))).head().getDouble(0) > 0)
  }
}
