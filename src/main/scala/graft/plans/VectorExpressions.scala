package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expressions for embedding math.
  *
  * The Column-API versions in [[graft.functions.VectorFns]] use
  * higher-order functions (`zip_with` + `aggregate`), whose lambda bodies
  * Catalyst evaluates interpreted, element by element. That's fine at
  * thousands of vectors; at 10^9 × 64-dim it's the hot loop of every ANN
  * scan. This expression generates a tight Java loop over the underlying
  * ArrayData inside whole-stage codegen — no per-element boxing, no
  * lambda dispatch (the preference order in SURVEY.md §4.3: built-in ops
  * → custom Expression → custom physical operator).
  *
  * Semantics: dot product accumulated in double over the common prefix of
  * the two arrays; NULL array → NULL; NULL *elements* are skipped (the
  * embeddings tables never contain them — documented divergence from the
  * zip_with version, which nulls the whole sum).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** argmin over a LITERAL codebook by squared-L2 distance, ties to the
  * LOWEST centroid id — the PQ assign/encode hot loop.
  *
  * Both earlier Column-API forms hit a wall at one end of the scale:
  * k unrolled `least(struct(chained-l2))` branches made Janino compile
  * time grow with k (~2.5 s per stage at k = 32), while the
  * transform/zip_with HOF rewrite allocated k intermediate arrays PER
  * ROW (8M-row encode 22 → 135 s). Here the codebook rides as a
  * reference object (double[][]) and the generated code is one
  * allocation-free double loop — code size k-invariant, per-row cost
  * k·dsub flops.
  *
  * Semantics contract (oracle-pinned via q191/q199/q200): per-centroid
  * distance accumulates left-to-right ((e₁+e₂)+e₃…, the SQL list_sum
  * order); strict `<` keeps the first (lowest) centroid id on ties.
  * Input must be array<double> with non-null elements (PQ sub-vectors
  * are produced by a cast-transform upstream); a NULL array yields
  * NULL. A vector SHORTER than the codebook's sub-dimension throws
  * IllegalArgumentException (both interpreted and codegen paths) —
  * silently argmin-ing over a truncated prefix would return a wrong
  * code for malformed input that the ANSI element_at formulation it
  * replaced failed loudly on. Longer vectors use their first dsub
  * components (the slice upstream already bounds them). */
case class ArgminL2(child: Expression, codebook: Array[Array[Double]])
    extends UnaryExpression {

  private val dsub: Int = codebook.map(_.length).max

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "argmin_l2"

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() < dsub) throw new IllegalArgumentException(
      s"argmin_l2: input vector of ${v.numElements()} elements is shorter" +
        s" than the codebook sub-dimension $dsub")
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < codebook.length) {
      val cent = codebook(c)
      var s = 0.0
      var t = 0
      while (t < cent.length) {
        val d = v.getDouble(t) - cent(t)
        s += d * d
        t += 1
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("codebook", codebook, "double[][]")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() < $dsub) {
         |  throw new IllegalArgumentException(
         |    "argmin_l2: input vector of " + $a.numElements() +
         |    " elements is shorter than the codebook sub-dimension $dsub");
         |}
         |int $best = 0;
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cb.length; $c++) {
         |  double $s = 0.0;
         |  for (int $t = 0; $t < $cb[$c].length; $t++) {
         |    double $d = $a.getDouble($t) - $cb[$c][$t];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bestD) { $bestD = $s; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArgminL2 =
    copy(child = newChild)
}

object VectorExpressions {

  /** Codegen'd dot product of two `array<float>` columns. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(FloatVectorDot(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd squared-L2 argmin of an `array<double>` column against a
    * literal codebook (ties → lowest id). */
  def argminL2(v: Column, codebook: Array[Array[Double]]): Column =
    Bridge.column(ArgminL2(Bridge.expression(v), codebook))
}
