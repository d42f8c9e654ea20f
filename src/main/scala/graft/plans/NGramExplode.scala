package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram GENERATOR — the UDTF rung of the Catalyst
  * extension ladder (next to the scalar Expressions, the optimizer
  * Rule, the Strategy and the physical Exec): one (pos, ngram) output
  * row per shingle, streamed straight out of the token array.
  *
  * Versus `posexplode(ngramsFromTokens(toks, n))`: the HOF pipeline
  * materializes the FULL intermediate ngram array per row (transform +
  * sequence + array_join allocations) before the Generate consumes it;
  * this generator emits shingles one at a time with no intermediate
  * array, so peak per-row allocation is one shingle — the difference is
  * bounded memory per row on pathological million-token documents.
  *
  * Edge semantics match TextFns.ngramsFromTokens on every non-null
  * array (gate-proven oracle parity there): a row with fewer than n
  * tokens emits ONE (possibly shorter) shingle, so no document drops
  * out of minhash. Divergence, deliberately: a NULL array emits NO
  * rows (explode semantics) where the HOF pipeline leaks one (0, null)
  * row via greatest(null, 1) — spec-pinned both ways. Null tokens
  * render as empty strings (array_join semantics).
  */
case class NGramExplode(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_explode needs array<string>, got ${other.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Nil
    val m = arr.numElements()
    val count = math.max(m - (n - 1), 1)
    val out = new Array[InternalRow](count)
    var i = 0
    while (i < count) {
      val upper = math.min(i + n, m)
      val parts = new Array[UTF8String](math.max(upper - i, 0))
      var k = i
      while (k < upper) {
        val s = arr.getUTF8String(k)
        parts(k - i) = if (s == null) UTF8String.EMPTY_UTF8 else s
        k += 1
      }
      out(i) = InternalRow(i, UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): NGramExplode =
    copy(child = newChild)
}

object NGramExplode {
  /** Column-API entry: `df.select($"id", NGramExplode.of($"toks", 3))`
    * plans a Generate node yielding (pos, ngram) rows. */
  def of(tokens: Column, n: Int): Column =
    Bridge.column(NGramExplode(Bridge.expression(tokens), n))
}

/** Range variant of [[NGramExplode]]: ONE generator pass emits every
  * n-gram for n ∈ [nMin, nMax] as (n, pos, ngram) rows — the
  * multi-width profile scan (q177 diversity, n-gram LM feature
  * extraction) that would otherwise re-read the corpus once per width.
  *
  * Edge semantics differ from [[NGramExplode]] DELIBERATELY: only FULL
  * n-grams are emitted (a row with fewer than n tokens contributes
  * nothing at that n) — diversity/LM statistics must not count
  * truncated grams, where minhash (NGramExplode's consumer) must not
  * drop short docs. Null tokens render as empty strings; a NULL array
  * emits no rows. */
case class NGramRangeExplode(child: Expression, nMin: Int, nMax: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(nMin >= 1 && nMax >= nMin,
    s"need 1 <= nMin <= nMax, got [$nMin, $nMax]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_range_explode needs array<string>, got ${other.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Nil
    val m = arr.numElements()
    val toks = new Array[UTF8String](m)
    var t = 0
    while (t < m) {
      val s = arr.getUTF8String(t)
      toks(t) = if (s == null) UTF8String.EMPTY_UTF8 else s
      t += 1
    }
    val out = Seq.newBuilder[InternalRow]
    var n = nMin
    while (n <= nMax) {
      var i = 0
      val count = m - n + 1
      while (i < count) {
        out += InternalRow(n, i,
          UTF8String.concatWs(space, toks.slice(i, i + n).toSeq: _*))
        i += 1
      }
      n += 1
    }
    out.result()
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NGramRangeExplode = copy(child = newChild)
}

object NGramRangeExplode {
  /** Column-API entry: plans a Generate yielding (n, pos, ngram). */
  def of(tokens: Column, nMin: Int, nMax: Int): Column =
    Bridge.column(NGramRangeExplode(Bridge.expression(tokens), nMin, nMax))
}
