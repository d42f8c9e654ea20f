package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static eval core for [[TokenSimHash]] — called from both the
  * interpreted path and the generated code (the standard pattern for
  * expressions whose body is too big to inline into codegen).
  *
  * Bit semantics are EXACTLY `ascii(substr(md5hex(token), b+1, 1)) % 2`
  * — the derivation TextFns.simhashFromDigests and the DuckDB oracles
  * use — computed straight from the digest bytes:
  * hex char b is nibble b of the digest; its ascii code is odd iff
  * (v < 10 and v odd) or (v >= 10 and v even)  ['0'..'9' = 48+v,
  * 'a'..'f' = 87+v].
  */
object SimHashUtil {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** votes[b] += ±1 per token by hex-parity of digest nibble b; bit b of
    * the result is set iff votes[b] > 0. Null tokens are skipped. */
  def compute(tokens: ArrayData, bits: Int): Long = {
    val digest = md.get()
    val votes = new Array[Int](bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        digest.reset()
        val d = digest.digest(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < bits) {
          val byte = d(b >> 1) & 0xff
          val v = if ((b & 1) == 0) byte >> 4 else byte & 0x0f
          val asciiOdd = if (v < 10) (v & 1) == 1 else (v & 1) == 0
          votes(b) += (if (asciiOdd) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) h |= 1L << b
      b += 1
    }
    h
  }
}

/** Native SimHash over a token array — one md5 per token, all `bits`
  * parities read straight off the digest bytes in a single JVM loop.
  *
  * The Column-API formulation ([[graft.functions.TextFns
  * .simhashFromDigests]]) runs `bits` interpreted `aggregate` lambdas
  * with a UTF8String `substr` allocation per (token, bit) — measured
  * ~3.8 s for 32 bits over 5k docs at sf0.1; this expression does the
  * same work in one pass (~50 ms). Same preference ladder as
  * [[FloatVectorDot]]: built-in ops → custom codegen'd Expression.
  *
  * Bit-for-bit identical to the HOF version and the DuckDB oracle SQL
  * (see [[SimHashUtil]]).
  */
case class TokenSimHash(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 64, "bits must be in [1, 64]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "token_simhash"

  override protected def nullSafeEval(tokens: Any): Any =
    SimHashUtil.compute(tokens.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.SimHashUtil.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): TokenSimHash =
    copy(child = newChild)
}

object TextExpressions {

  /** Codegen'd SimHash of an `array<string>` token column. */
  def simhash(tokens: Column, bits: Int): Column =
    Bridge.column(TokenSimHash(Bridge.expression(tokens), bits))
}
