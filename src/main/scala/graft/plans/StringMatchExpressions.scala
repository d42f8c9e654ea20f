package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static eval core for [[DamerauLevenshtein]]: the UNRESTRICTED
  * Damerau–Levenshtein distance (Lowrance–Wagner 1975) — insertions,
  * deletions, substitutions, and transpositions of two ADJACENT
  * characters, where the transposed block may be edited further (so
  * "ca" → "abc" is 2: transpose + insert, which the restricted
  * optimal-string-alignment variant forbids). This is the variant
  * DuckDB's `damerau_levenshtein` implements, which is what makes the
  * operator oracle-gateable; goldens in Extended21Spec pin the parity.
  *
  * O(|a|·|b|) time and space per call — intended for SHORT dimension
  * strings (names, codes) after a blocking join has bounded the pair
  * set, never for document bodies. Comparison is per UTF-16 char,
  * identical to per-codepoint for the ASCII data this engine's
  * dimension strings hold.
  */
object DamerauUtil {

  def distance(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString
    val b = ub.toString
    val m = a.length
    val n = b.length
    if (m == 0) return n.toLong
    if (n == 0) return m.toLong
    val maxd = m + n
    // d is offset by +1: d(0)(*) / d(*)(0) is the maxd sentinel border
    // that makes the transposition lookup safe at the edges.
    val d = Array.ofDim[Int](m + 2, n + 2)
    d(0)(0) = maxd
    var i = 0
    while (i <= m) { d(i + 1)(0) = maxd; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= n) { d(0)(j + 1) = maxd; d(1)(j + 1) = j; j += 1 }
    // da(c) = largest row index i' with a(i'-1) == c seen so far
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= m) {
      var db = 0
      val ai = a.charAt(i - 1)
      j = 1
      while (j <= n) {
        val bj = b.charAt(j - 1)
        val k: Int = { val v = da.get(bj); if (v == null) 0 else v.intValue() }
        val l = db
        val cost = if (ai == bj) { db = j; 0 } else 1
        var best = d(i)(j) + cost                       // substitute / match
        val ins = d(i + 1)(j) + 1                        // insert
        if (ins < best) best = ins
        val del = d(i)(j + 1) + 1                        // delete
        if (del < best) best = del
        val tr = d(k)(l) + (i - k - 1) + 1 + (j - l - 1) // transpose block
        if (tr < best) best = tr
        d(i + 1)(j + 1) = best
        j += 1
      }
      da.put(ai, i)
      i += 1
    }
    d(m + 1)(n + 1).toLong
  }
}

/** Native unrestricted Damerau–Levenshtein distance of two string
  * columns (LongType). Spark ships `levenshtein` but no
  * transposition-aware variant; entity-resolution over hand-keyed
  * dimension strings wants one, because the single most common typo
  * class — two adjacent characters swapped — costs 2 under plain
  * Levenshtein and 1 here. Same extension-ladder rung as
  * [[TokenSimHash]]: a codegen'd Expression whose generated code is
  * one static call. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "damerau_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauUtil.distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.DamerauUtil.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

/** Aho–Corasick automaton over an ASCII pattern set, precompiled to a
  * dense goto-DFA (failure links folded in at build time), with the
  * output function closed over failure chains — one O(|text|) pass
  * reports, for each pattern, whether it occurs as a substring.
  *
  * Built once per [[MultiPatternMatch]] expression instance (driver
  * side) and shipped to executors as a plan reference object; the scan
  * loop is branch-light (one table lookup per char) and allocates
  * nothing until a match is found. Characters ≥ 128 can never match an
  * edge (patterns are required ASCII) and reset to the root state —
  * exactly `contains` semantics for ASCII patterns over any text.
  */
final class AcAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "at least one pattern")
  require(patterns.forall(p => p.nonEmpty && p.forall(_ < 128)),
    "patterns must be non-empty ASCII strings")

  val nPatterns: Int = patterns.length

  // Dense tables: next(state·128 + char) transition DFA (flattened to
  // ONE int array — a single bounds check and better cache locality
  // than a 2D table in the per-byte hot loop); outs(state) = ids of
  // patterns ENDING at this state (failure-closed).
  private val (next: Array[Int], outs: Array[Array[Int]]) = {
    val maxNodes = patterns.map(_.length).sum + 1
    val goto = Array.fill(maxNodes)(Array.fill(128)(-1))
    val out = Array.fill(maxNodes)(List.empty[Int])
    var nNodes = 1
    var p = 0
    while (p < patterns.length) {
      var u = 0
      patterns(p).foreach { ch =>
        val c = ch.toInt
        if (goto(u)(c) == -1) { goto(u)(c) = nNodes; nNodes += 1 }
        u = goto(u)(c)
      }
      out(u) ::= p
      p += 1
    }
    val fail = new Array[Int](nNodes)
    val queue = new java.util.ArrayDeque[Integer]()
    var c = 0
    while (c < 128) {
      if (goto(0)(c) == -1) goto(0)(c) = 0
      else { fail(goto(0)(c)) = 0; queue.add(goto(0)(c)) }
      c += 1
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      out(u) = out(u) ++ out(fail(u)) // output closure via failure chain
      c = 0
      while (c < 128) {
        val v = goto(u)(c)
        if (v == -1) goto(u)(c) = goto(fail(u))(c)
        else { fail(v) = goto(fail(u))(c); queue.add(v) }
        c += 1
      }
    }
    val flat = new Array[Int](nNodes * 128)
    var u = 0
    while (u < nNodes) {
      System.arraycopy(goto(u), 0, flat, u * 128, 128)
      u += 1
    }
    (flat, out.take(nNodes).map(_.toArray.sorted))
  }

  /** Patterns present in `text`, as a catalyst array of UTF8Strings in
    * original pattern order. Early-exits once every pattern matched.
    * Reads bytes straight off the UTF8String (no copy); per byte the
    * loop is one flat-table load plus an output-emptiness check. */
  def matchedPatterns(text: UTF8String): GenericArrayData = {
    val found = new Array[Boolean](nPatterns)
    var nFound = 0
    val n = text.numBytes()
    val tbl = next
    var u = 0
    var i = 0
    while (i < n && nFound < nPatterns) {
      val c = text.getByte(i) & 0xff
      u = if (c < 128) tbl((u << 7) | c) else 0
      val o = outs(u)
      var t = 0
      while (t < o.length) {
        if (!found(o(t))) { found(o(t)) = true; nFound += 1 }
        t += 1
      }
      i += 1
    }
    val hits = new Array[Any](nFound)
    var p = 0
    var w = 0
    while (p < nPatterns) {
      if (found(p)) { hits(w) = UTF8String.fromString(patterns(p)); w += 1 }
      p += 1
    }
    new GenericArrayData(hits)
  }
}

/** Native multi-pattern substring search: `array<string>` of the
  * blocklist patterns occurring in the input, in pattern order. The
  * built-in formulation — `filter(array(lits), p -> contains(text, p))`
  * — rescans the text once PER PATTERN (O(|text|·|patterns|) with an
  * interpreted lambda dispatch per element); the Aho–Corasick automaton
  * ([[AcAutomaton]]) answers all patterns in ONE pass, which is the
  * difference between a blocklist of 10 and a blocklist of 10,000
  * being the same scan cost at 100 TB. */
case class MultiPatternMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  // validate eagerly (constructor time, driver side), not first-eval
  require(patterns.nonEmpty, "at least one pattern")
  require(patterns.forall(p => p.nonEmpty && p.forall(_ < 128)),
    "patterns must be non-empty ASCII strings")

  @transient private lazy val ac = new AcAutomaton(patterns.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "multi_pattern_match"

  override protected def nullSafeEval(text: Any): Any =
    ac.matchedPatterns(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val acRef = ctx.addReferenceObj("ac", ac, classOf[AcAutomaton].getName)
      s"${ev.value} = $acRef.matchedPatterns($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): MultiPatternMatch =
    copy(child = newChild)
}

object StringMatchExpressions {

  /** Codegen'd unrestricted Damerau–Levenshtein distance (LongType). */
  def damerauLevenshtein(a: Column, b: Column): Column =
    Bridge.column(DamerauLevenshtein(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd Aho–Corasick multi-pattern containment: the subset of
    * `patterns` occurring in `text`, in pattern order. */
  def multiMatch(text: Column, patterns: Seq[String]): Column =
    Bridge.column(MultiPatternMatch(Bridge.expression(text), patterns))
}
