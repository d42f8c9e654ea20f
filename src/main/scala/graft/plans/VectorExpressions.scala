package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StructField, StructType}

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

/** max-cosine classification against a LITERAL labeled codebook in one
  * codegen'd pass — the centroid-classifier hot loop (q217–q223).
  *
  * The Column form (`greatest` over k `struct(cosine, label)` branches)
  * is the [[ArgminL2]] story again: 58 s to classify 1M dim-64 vectors
  * against TEN centroids, where the same dot products phrased as plain
  * projections cost ~3 s — per-row struct allocation and interpreted
  * struct comparison dominate, and code size grows with k. Here the
  * codebook and its precomputed self-norms ride as reference objects;
  * per row: ONE self-dot + k fused dot/compare steps, allocation-free
  * until the single output struct.
  *
  * Semantics contract (oracle-pinned via q217/q218/q219/q222/q223):
  *  - score_c = dot(v,c) / (sqrt(dot(v,v)) · norm_c), every sum
  *    accumulated left-to-right in double over floats — bit-identical
  *    to the `FloatVectorDot`-composed expression and the DuckDB
  *    list_sum form;
  *  - centroids are visited in ASCENDING label order and accepted on
  *    score >= best under Spark's nan-safe double ordering (NaN
  *    greatest, -0.0 = 0.0), so ties resolve toward the LARGER label —
  *    exactly `greatest(struct(score, label))` and the oracle's
  *    `row_number() OVER (ORDER BY score DESC, cl DESC)`;
  *  - `width` > 0 classifies on the first `width` components (the
  *    Matryoshka raters) without materializing a slice;
  *  - NULL array → NULL row; NULL elements are skipped in sums (the
  *    [[FloatVectorDot]] contract).
  *
  * @param labeled (label, centroid) pairs; sorted internally
  */
case class CosineArgmax(child: Expression,
    labeled: Array[(Int, Array[Float])], width: Int = 0)
    extends UnaryExpression {
  require(labeled.nonEmpty, "cosine_argmax needs a non-empty codebook")
  require(labeled.map(_._1).distinct.length == labeled.length,
    "cosine_argmax labels must be distinct")

  private val sorted = labeled.sortBy(_._1)
  private val labels: Array[Int] = sorted.map(_._1)
  private val codebook: Array[Array[Float]] = sorted.map { case (_, c) =>
    if (width > 0) c.take(width) else c
  }
  // sqrt of the sequential double self-dot — the same double the
  // expression form sqrt(dot(c,c)) produces
  private val norms: Array[Double] = codebook.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("pred", IntegerType, nullable = false)))
  override def prettyName: String = "cosine_argmax"

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = {
      val ne = v.numElements()
      if (width > 0 && width < ne) width else ne
    }
    var sv = 0.0
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = v.getFloat(i).toDouble; sv += x * x
      }
      i += 1
    }
    val nv = math.sqrt(sv)
    var bestS = 0.0
    var bestL = 0
    var c = 0
    while (c < codebook.length) {
      val cent = codebook(c)
      val m = math.min(n, cent.length)
      var s = 0.0
      var t = 0
      while (t < m) {
        if (!v.isNullAt(t)) s += v.getFloat(t).toDouble * cent(t).toDouble
        t += 1
      }
      val score = s / (nv * norms(c))
      if (c == 0 || nanSafeGe(score, bestS)) { bestS = score; bestL = labels(c) }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestS, bestL))
  }

  private def nanSafeGe(x: Double, y: Double): Boolean = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if (xn) true else if (yn) false else x >= y
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the whole argmax body lives in its OWN generated method: WSCG
      // consume methods routinely blow past HotSpot's 8000-byte
      // DontCompileHugeMethods limit when a wide child expression
      // (e.g. a 64-element array constructor) inlines next to an
      // operator loop — past the limit the JIT silently never compiles
      // the method and the stage runs interpreted BYTECODE (~30×;
      // measured 41 s vs 0.5 s on 600k rows). A separate method keeps
      // the loop compilable no matter how wide the child is.
      val cb = ctx.addReferenceObj("codebook", codebook, "float[][]")
      val nm = ctx.addReferenceObj("norms", norms, "double[]")
      val lb = ctx.addReferenceObj("labels", labels, "int[]")
      val widthCap = if (width > 0)
        s"if (n > $width) n = $width;" else ""
      val fn = ctx.freshName("cosineArgmax")
      val method = ctx.addNewFunction(fn,
        s"""
           |private org.apache.spark.sql.catalyst.InternalRow $fn(
           |    org.apache.spark.sql.catalyst.util.ArrayData a) {
           |  int n = a.numElements();
           |  $widthCap
           |  float[][] cb = $cb;
           |  double sv = 0.0;
           |  for (int i = 0; i < n; i++) {
           |    if (!a.isNullAt(i)) {
           |      double x = (double) a.getFloat(i);
           |      sv += x * x;
           |    }
           |  }
           |  double nv = java.lang.Math.sqrt(sv);
           |  double bestS = 0.0;
           |  int bestL = 0;
           |  for (int c = 0; c < cb.length; c++) {
           |    int m = java.lang.Math.min(n, cb[c].length);
           |    double s = 0.0;
           |    for (int t = 0; t < m; t++) {
           |      if (!a.isNullAt(t)) {
           |        s += (double) a.getFloat(t) * (double) cb[c][t];
           |      }
           |    }
           |    double sc = s / (nv * ($nm)[c]);
           |    boolean acc;
           |    if (c == 0 || java.lang.Double.isNaN(sc)) { acc = true; }
           |    else if (java.lang.Double.isNaN(bestS)) { acc = false; }
           |    else { acc = sc >= bestS; }
           |    if (acc) { bestS = sc; bestL = ($lb)[c]; }
           |  }
           |  return new org.apache.spark.sql.catalyst.expressions
           |    .GenericInternalRow(new Object[]{
           |      java.lang.Double.valueOf(bestS),
           |      java.lang.Integer.valueOf(bestL)});
           |}
         """.stripMargin)
      s"${ev.value} = $method($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): CosineArgmax =
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

  /** Codegen'd max-cosine classification of an `array<float>` column
    * against a labeled literal codebook: one struct<score, pred> per
    * row, ties toward the larger label; `width` > 0 restricts to the
    * leading components (Matryoshka prefix) without a slice copy. */
  def cosineArgmax(v: Column, labeled: Array[(Int, Array[Float])],
      width: Int = 0): Column =
    Bridge.column(CosineArgmax(Bridge.expression(v), labeled, width))
}
