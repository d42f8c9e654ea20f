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
