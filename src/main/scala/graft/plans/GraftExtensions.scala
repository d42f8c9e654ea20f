package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql("SELECT vec_dot(a, b)")`
  * and the Column API share one codegen'd implementation.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` at
  * session build time, or call [[GraftExtensions.register]] on a live
  * session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => AsOfJoinPushdown)
  }
}

object GraftExtensions {

  private def info(name: String) =
    new ExpressionInfo(classOf[FloatVectorDot].getCanonicalName, null, name)

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      info("vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot takes exactly 2 arguments")
        FloatVectorDot(args.head, args(1))
      }),
    ("simhash_tokens",
      info("simhash_tokens"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "simhash_tokens takes (tokens, bits)")
        require(args(1).foldable, "bits must be a literal")
        TokenSimHash(args.head,
          args(1).eval().asInstanceOf[Number].intValue())
      }),
    ("ngram_explode",
      info("ngram_explode"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "ngram_explode takes (tokens, n)")
        require(args(1).foldable, "n must be a literal")
        NGramExplode(args.head,
          args(1).eval().asInstanceOf[Number].intValue())
      }),
    ("ngram_range_explode",
      info("ngram_range_explode"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "ngram_range_explode takes (tokens, nMin, nMax)")
        require(args(1).foldable && args(2).foldable,
          "nMin/nMax must be literals")
        NGramRangeExplode(args.head,
          args(1).eval().asInstanceOf[Number].intValue(),
          args(2).eval().asInstanceOf[Number].intValue())
      }),
    // Runtime-filter surface: Spark's BloomFilterAggregate /
    // BloomFilterMightContain are internal (the optimizer injects them via
    // InjectRuntimeFilter when statistics warrant). Registering them as SQL
    // functions makes the pattern available EXPLICITLY: build a ~1 MB bloom
    // over the dim-side keys in a scalar subquery, prefilter the fact scan
    // with might_contain before the shuffle join. At 100 TB this is the
    // difference between shuffling every fact row and shuffling only rows
    // whose key plausibly survives the join.
    ("bloom_agg",
      info("bloom_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          "bloom_agg takes (xxhash64ed_key[, est_num_items])")
        if (args.length == 1)
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(args.head)
        else {
          require(args(1).foldable, "est_num_items must be a literal")
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(args.head,
              args(1).eval().asInstanceOf[Number].longValue())
        }
      }),
    ("might_contain",
      info("might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "might_contain takes (bloom, xxhash64ed_key)")
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(args.head, args(1))
      })
  )

  /** Register on an already-built session (tests, REPLs). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (name, inf, builder) =>
      registry.registerFunction(FunctionIdentifier(name), inf, builder)
    }
  }
}
