package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
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

  // An MD5 digest has exactly 32 hex nibbles, so bit b reads nibble b of
  // the digest — bits > 32 would index past the 16-byte digest. Matches
  // the TextFns.simhashFromDigests bound.
  require(bits >= 1 && bits <= 32, "bits must be in [1, 32] (md5 has 32 hex nibbles)")

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

/** Static eval core for [[MinHashSig]]: word n-gram shingling + md5 +
  * per-chunk minima in one pass.
  *
  * Derivation is EXACTLY the HOF/oracle pipeline
  * (TextFns.ngramsFromTokens → shingleDigests → minhashFromDigests):
  * shingle i = tokens[i..i+n) joined with single spaces (short tail kept,
  * min one shingle); hash j of a shingle = hex chars [8j, 8j+8) of
  * md5(shingle); signature j = lexicographic min over shingles — all
  * reproduced byte-for-byte from the digest bytes.
  */
object MinHashUtil {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val hex = "0123456789abcdef".toCharArray

  /** [[compute]] wrapped as catalyst ArrayData (shared by interpreted
    * eval and generated code). */
  def computeArrayData(tokens: ArrayData, ngram: Int, numHashes: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val mins = compute(tokens, ngram, numHashes)
    val out = new Array[Any](mins.length)
    var i = 0
    while (i < mins.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(mins(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def compute(tokens: ArrayData, ngram: Int, numHashes: Int): Array[String] = {
    val digest = md.get()
    val k = tokens.numElements()
    val nShingles = math.max(k - (ngram - 1), 1)
    val mins = new Array[String](numHashes)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nShingles) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + ngram, k)
      var first = true
      while (j < end) {
        if (!tokens.isNullAt(j)) { // array_join skips nulls
          if (!first) sb.append(' ')
          sb.append(tokens.getUTF8String(j).toString)
          first = false
        }
        j += 1
      }
      digest.reset()
      val d = digest.digest(sb.toString.getBytes("UTF-8"))
      val hexChars = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hexChars(2 * b) = hex((d(b) >> 4) & 0x0f)
        hexChars(2 * b + 1) = hex(d(b) & 0x0f)
        b += 1
      }
      val hx = new String(hexChars)
      var h = 0
      while (h < numHashes) {
        val chunk = hx.substring(h * 8, h * 8 + 8)
        if (mins(h) == null || chunk.compareTo(mins(h)) < 0) mins(h) = chunk
        h += 1
      }
      i += 1
    }
    mins
  }
}

/** Native MinHash signature over a token array: `numHashes` (≤ 4)
  * 8-hex-char chunk minima from one md5 per word `ngram`-shingle, in a
  * single JVM pass — replaces a transform(md5) + `numHashes`
  * interpreted `aggregate` lambdas. Same ladder as [[TokenSimHash]]. */
case class MinHashSig(child: Expression, ngram: Int, numHashes: Int)
    extends UnaryExpression {

  require(ngram >= 1, "ngram >= 1")
  require(numHashes >= 1 && numHashes <= 4, "md5 has four 8-hex chunks")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(tokens: Any): Any =
    MinHashUtil.computeArrayData(
      tokens.asInstanceOf[ArrayData], ngram, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.MinHashUtil.computeArrayData($c, $ngram, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Distinct-set Jaccard similarity of two `array<string>` columns —
  * |A∩B| / |A∪B| over the DISTINCT elements, null elements skipped,
  * NULL when the union is empty (divide-by-zero parity with the
  * size(array_intersect)/size-arithmetic formulation).
  *
  * The verification stage of fuzzy dedup runs this once per candidate
  * pair; `array_intersect` evaluates interpreted per element with a
  * full intermediate array allocation, this is one hash-set pass. */
case class StringArrayJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> arguments")
    }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "string_array_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardUtil.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ctx.freshName("jac")
      s"""
         |Object $v = graft.plans.JaccardUtil.compute($a, $b);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $v).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StringArrayJaccard =
    copy(left = newLeft, right = newRight)
}

/** Distinct-set intersection COUNT of two `array<string>` columns —
  * the integer core of [[StringArrayJaccard]] for callers that keep
  * similarity tests in exact integer arithmetic (q138's cross-
  * multiplied Jaccard threshold): with per-doc set sizes known,
  * `union = |a| + |b| - inter` needs no float and no second pass.
  * Same UTF8String hash-set sweep, one JVM call per row, codegen'd.
  */
case class StringArrayIntersect(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> arguments")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "string_array_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardUtil.intersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaccardUtil.intersectCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StringArrayIntersect =
    copy(left = newLeft, right = newRight)
}

object JaccardUtil {

  /** Distinct elements of `b` also present in `a` (set-intersection
    * cardinality; null elements ignored on both sides). */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val sa = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) sa.add(a.getUTF8String(i))
      i += 1
    }
    val seenB = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var inter = 0L
    i = 0
    while (i < b.numElements()) {
      if (!b.isNullAt(i)) {
        val e = b.getUTF8String(i)
        if (seenB.add(e) && sa.contains(e)) inter += 1
      }
      i += 1
    }
    inter
  }

  /** Per-doc build half of the hash-sorted intersect (r18): XXH64 each
    * token once, co-sort (hash, token) ascending. The per-PAIR probe
    * then merges on longs instead of hashing every string byte again
    * ([[hashSortedIntersect]]) — the q138/q145 verify stage was ~pure
    * CPU in UTF8String murmur re-hashing (UTF8String caches nothing;
    * HashSet.add + contains each re-scan the bytes). A plain
    * sorted-STRING merge was tried and REVERTED (commit 47fc025):
    * shingles share long prefixes, compareTo scans them — sorting by
    * the 64-bit hash makes ties (forced string compares) vanishingly
    * rare while staying EXACT (equal-hash runs are confirmed by string
    * equality, so a collision can never miscount).
    */
  def hashSortTokens(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var m = 0
    val strs = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { strs(m) = arr.getUTF8String(i); m += 1 }
      i += 1
    }
    val idx = new Array[Integer](m)
    val hashes = new Array[Long](m)
    i = 0
    while (i < m) {
      val s = strs(i)
      hashes(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      idx(i) = Integer.valueOf(i)
      i += 1
    }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = java.lang.Long.compare(hashes(a), hashes(b))
        if (c != 0) c else strs(a).compareTo(strs(b))
      }
    })
    val hOut = new Array[Long](m)
    val tOut = new Array[Any](m)
    i = 0
    while (i < m) {
      hOut(i) = hashes(idx(i)); tOut(i) = strs(idx(i)); i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        new org.apache.spark.sql.catalyst.util.GenericArrayData(hOut),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(tOut)))
  }

  /** Per-pair probe half: exact |A ∩ B| of two [[hashSortTokens]]
    * structs — a merge over the sorted hash arrays; only equal-hash
    * runs (overwhelmingly 1×1) touch string bytes, and those are
    * confirmed by equality, so the count is exact set intersection
    * regardless of hash collisions (strings within a doc are distinct
    * by construction, hence strictly sorted within a run). */
  def hashSortedIntersect(a: InternalRow, b: InternalRow): Long = {
    val ha = a.getArray(0); val ta = a.getArray(1)
    val hb = b.getArray(0); val tb = b.getArray(1)
    val na = ha.numElements(); val nb = hb.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < na && j < nb) {
      val x = ha.getLong(i); val y = hb.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        var i2 = i + 1
        while (i2 < na && ha.getLong(i2) == x) i2 += 1
        var j2 = j + 1
        while (j2 < nb && hb.getLong(j2) == x) j2 += 1
        if (i2 - i == 1 && j2 - j == 1) {
          if (ta.getUTF8String(i).equals(tb.getUTF8String(j))) inter += 1
        } else {
          var p = i; var q = j
          while (p < i2 && q < j2) {
            val c = ta.getUTF8String(p).compareTo(tb.getUTF8String(q))
            if (c < 0) p += 1
            else if (c > 0) q += 1
            else { inter += 1; p += 1; q += 1 }
          }
        }
        i = i2; j = j2
      }
    }
    inter
  }

  /** Boxed Double (null when the union is empty). */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val sa = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) sa.add(a.getUTF8String(i))
      i += 1
    }
    val seenB = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var inter = 0
    i = 0
    while (i < b.numElements()) {
      if (!b.isNullAt(i)) {
        val e = b.getUTF8String(i)
        if (seenB.add(e) && sa.contains(e)) inter += 1
      }
      i += 1
    }
    val union = sa.size + seenB.size - inter
    if (union == 0) null else java.lang.Double.valueOf(inter.toDouble / union)
  }
}

/** Static eval core for [[PiiScan]]: one JVM call that audits AND
  * redacts every PII pattern over a single materialized String.
  *
  * Semantics are EXACTLY the Column-API formulation it replaces
  * (TextFns.piiCount ×3 + TextFns.redactPii = md5 of a 3-deep
  * regexp_replace chain):
  *  - counts are NON-OVERLAPPING `Matcher.find` counts of each pattern
  *    over the ORIGINAL text, independently (NOT a combined alternation
  *    — overlapping spans across patterns must count for each);
  *  - redaction applies the patterns SEQUENTIALLY in [[graft.functions
  *    .TextFns.PiiPatterns]] order (emails before phone-digit runs), each
  *    pass over the previous pass's output — order-sensitive, so it is
  *    preserved, not fused.
  *
  * What the fusion buys: the 6 logical regex passes previously ran as 6
  * separate codegen'd expressions, each converting the (recomputed)
  * input UTF8String to a fresh java.lang.String and allocating the
  * intermediate redaction results as UTF8Strings between operators. Here
  * the input converts ONCE, intermediates stay java.lang.Strings, and
  * the matchers run back-to-back on a cache-hot value.
  */
object PiiUtil {

  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  private val patterns: Array[java.util.regex.Pattern] =
    graft.functions.TextFns.PiiPatterns
      .map(p => java.util.regex.Pattern.compile(p._1)).toArray
  private val tags: Array[String] =
    graft.functions.TextFns.PiiPatterns.map(_._2).toArray

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val out = new Array[Any](patterns.length + 1)
    var i = 0
    while (i < patterns.length) {
      val m = patterns(i).matcher(s)
      var n = 0L
      while (m.find()) n += 1
      out(i) = n
      i += 1
    }
    var red = s
    i = 0
    while (i < patterns.length) {
      red = patterns(i).matcher(red).replaceAll(tags(i))
      i += 1
    }
    out(patterns.length) = UTF8String.fromString(red)
    new GenericInternalRow(out)
  }
}

/** Static eval core for [[WinnowFps]]: word k-gram shingling + md5 +
  * sliding-window minima + order-preserving distinct in ONE pass.
  *
  * Derivation is EXACTLY the HOF pipeline in
  * [[graft.ext.TextDedup.winnowFingerprints]] (and the DuckDB oracles):
  * gram i = tokens[i..i+k) joined with single spaces (nulls skipped,
  * empties kept — array_join semantics); hash i = lowercase md5 hex of
  * gram i (UTF-8 bytes); window q selects the lexicographic min of
  * hashes [q, q+w); the result is the first-occurrence-ordered distinct
  * of the window minima (array_distinct semantics). Hex is pure ASCII,
  * so String.compareTo ≡ UTF8String binary ordering here.
  *
  * Why it exists (optimization round 18): the HOF formulation pays, per
  * row, one interpreted lambda tree per stage, a gram-string allocation
  * per shingle, a fresh commons-codec MessageDigest per md5 call, and a
  * w-element array copy per window (slice + array_min). This runs the
  * identical arithmetic with a thread-local digest, one reusable byte
  * buffer, and an O(n) monotone-deque window minimum.
  *
  * Inputs with fewer than w full grams return an EMPTY array — callers
  * (winnowFingerprints) filter `size(tokens) >= k + w - 1` first, so
  * the branch is unreachable there; the HOF formulation errors on that
  * domain (sequence(1, 0) → slice(_, 0, w)), so empty is the only
  * behavior change and only outside the operator's contract.
  */
object WinnowUtil {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val hex = "0123456789abcdef".toCharArray

  def compute(tokens: ArrayData, k: Int, w: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val digest = md.get()
    val n = tokens.numElements()
    // ngramsFromTokens: greatest(n - (k-1), 1) grams — the short-tail
    // single gram when n < k is kept for parity, though callers filter
    val nGrams = math.max(n - (k - 1), 1)
    val hs = new Array[String](nGrams)
    var buf = new Array[Byte](64)
    var i = 0
    while (i < nGrams) {
      var len = 0
      var j = i
      val end = math.min(i + k, n)
      var first = true
      while (j < end) {
        if (!tokens.isNullAt(j)) { // array_join skips nulls
          val t = tokens.getUTF8String(j)
          val tb = t.numBytes()
          if (len + tb + 1 > buf.length)
            buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + tb + 1))
          if (!first) { buf(len) = ' '; len += 1 }
          t.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + len)
          len += tb
          first = false
        }
        j += 1
      }
      digest.reset()
      digest.update(buf, 0, len)
      val d = digest.digest()
      val hexChars = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hexChars(2 * b) = hex((d(b) >> 4) & 0x0f)
        hexChars(2 * b + 1) = hex(d(b) & 0x0f)
        b += 1
      }
      hs(i) = new String(hexChars)
      i += 1
    }
    val nWin = nGrams - (w - 1)
    if (nWin <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](0))
    // monotone deque of indices: values ascending front→back; ties keep
    // the LATER index (same string value, so the selected fingerprint —
    // what the output carries — is identical to array_min's)
    val dq = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[String]()
    i = 0
    while (i < nGrams) {
      while (tail > head && hs(dq(tail - 1)).compareTo(hs(i)) >= 0) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(hs(dq(head)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Static eval core for [[DistinctNGrams]]: word n-gram shingling +
  * order-preserving distinct in ONE pass — byte-identical to
  * `array_distinct(TextFns.ngramsFromTokens(toks, n))` on every input
  * (short-tail single gram when the array is shorter than n; null
  * tokens skipped with no separator, array_join semantics; distinct
  * keeps first occurrence). The HOF pipeline evaluates an interpreted
  * lambda per shingle with a slice copy + array_join allocation each,
  * then a second array_distinct pass; this builds each gram string
  * once off a reusable byte buffer. */
object NGramUtil {

  def distinct(tokens: ArrayData, n: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val m = tokens.numElements()
    val nGrams = math.max(m - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var buf = new Array[Byte](64)
    var i = 0
    while (i < nGrams) {
      var len = 0
      var j = i
      val end = math.min(i + n, m)
      var first = true
      while (j < end) {
        if (!tokens.isNullAt(j)) {
          val t = tokens.getUTF8String(j)
          val tb = t.numBytes()
          if (len + tb + 1 > buf.length)
            buf = java.util.Arrays.copyOf(buf,
              math.max(buf.length * 2, len + tb + 1))
          if (!first) { buf(len) = ' '; len += 1 }
          t.writeToMemory(buf,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + len)
          len += tb
          first = false
        }
        j += 1
      }
      seen.add(org.apache.spark.unsafe.types.UTF8String
        .fromBytes(java.util.Arrays.copyOf(buf, len)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native distinct word n-grams of an `array<string>` token column —
  * the shingle-set builder behind similarity joins, greedy cover and
  * decontamination. Same preference ladder as [[TokenSimHash]]. */
case class DistinctNGrams(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "gram order must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_ngrams"

  override protected def nullSafeEval(tokens: Any): Any =
    NGramUtil.distinct(tokens.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NGramUtil.distinct($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): DistinctNGrams =
    copy(child = newChild)
}

/** Native winnowing fingerprint selection (Schleimer–Wilkerson–Aiken)
  * over a token array: distinct window-min md5 hex strings of word
  * k-grams, one JVM pass per row. Byte-identical to the HOF pipeline in
  * [[graft.ext.TextDedup.winnowFingerprints]] on its contract domain
  * (see [[WinnowUtil]]); same preference ladder as [[TokenSimHash]]. */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1, "gram order must be >= 1")
  require(w >= 1, "window must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(tokens: Any): Any =
    WinnowUtil.compute(tokens.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WinnowUtil.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

/** Native fused PII audit + redaction over a string column — one
  * expression producing `struct<n_emails, n_ips, n_phones: bigint,
  * redacted: string>`. See [[PiiUtil]] for the exact semantics and why
  * the fusion is safe. Same ladder as [[TokenSimHash]]: the generated
  * code is a single static call. */
case class PiiScan(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_emails", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_ips", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_phones", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("redacted", StringType, nullable = false)))

  override def prettyName: String = "pii_scan"

  override protected def nullSafeEval(text: Any): Any =
    PiiUtil.compute(text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PiiUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiScan =
    copy(child = newChild)
}

/** Build half of the hash-sorted exact intersect (see
  * [[JaccardUtil.hashSortTokens]]): `array<string>` →
  * `struct<h: array<bigint>, t: array<string>>` co-sorted by
  * (XXH64(token), token). One JVM call per doc at set-build time;
  * the per-pair probe ([[HashSortedIntersect]]) then never re-hashes
  * token bytes.
  */
case class HashSortTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = HashSortTokens.schema
  override def prettyName: String = "hash_sort_tokens"

  override protected def nullSafeEval(tokens: Any): Any =
    JaccardUtil.hashSortTokens(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.JaccardUtil.hashSortTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): HashSortTokens =
    copy(child = newChild)
}

object HashSortTokens {
  val schema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "h", ArrayType(LongType, containsNull = false), nullable = false),
      org.apache.spark.sql.types.StructField(
        "t", ArrayType(StringType, containsNull = false), nullable = false)))
}

/** Probe half: exact distinct-set |A ∩ B| of two [[HashSortTokens]]
  * structs via the long-merge sweep ([[JaccardUtil.hashSortedIntersect]]).
  * Replaces [[StringArrayIntersect]] in the q138/q145 verify stages —
  * identical LongType result (exactness argument on the util). */
case class HashSortedIntersect(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == HashSortTokens.schema &&
        right.dataType == HashSortTokens.schema)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two hash_sort_tokens structs")
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "hash_sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardUtil.hashSortedIntersect(
      a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaccardUtil.hashSortedIntersect($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashSortedIntersect =
    copy(left = newLeft, right = newRight)
}

object TextExpressions {

  /** Codegen'd SimHash of an `array<string>` token column. */
  def simhash(tokens: Column, bits: Int): Column =
    Bridge.column(TokenSimHash(Bridge.expression(tokens), bits))

  /** Fused PII audit + redaction struct of a string column. */
  def piiScan(text: Column): Column =
    Bridge.column(PiiScan(Bridge.expression(text)))

  /** Codegen'd distinct-set Jaccard of two `array<string>` columns. */
  def jaccard(a: Column, b: Column): Column =
    Bridge.column(StringArrayJaccard(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd distinct-set intersection count (LongType). */
  def intersectCount(a: Column, b: Column): Column =
    Bridge.column(StringArrayIntersect(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd hash-sorted token struct (build half of the exact
    * hash-merge intersect). */
  def hashSortTokens(tokens: Column): Column =
    Bridge.column(HashSortTokens(Bridge.expression(tokens)))

  /** Codegen'd exact intersect count over two [[hashSortTokens]]
    * structs (probe half — merge on longs, no per-pair re-hashing). */
  def hashSortedIntersect(a: Column, b: Column): Column =
    Bridge.column(HashSortedIntersect(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd MinHash signature (array of `numHashes` hex chunks) of an
    * `array<string>` token column over word `ngram`-shingles. */
  def minhashSig(tokens: Column, ngram: Int, numHashes: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(tokens), ngram, numHashes))

  /** Codegen'd winnowing fingerprints (distinct window-min md5 hex of
    * word k-grams) of an `array<string>` token column. */
  def winnowFps(tokens: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFps(Bridge.expression(tokens), k, w))

  /** Codegen'd distinct word n-grams of an `array<string>` token
    * column (≡ array_distinct(ngramsFromTokens(t, n)), one pass). */
  def distinctNgrams(tokens: Column, n: Int): Column =
    Bridge.column(DistinctNGrams(Bridge.expression(tokens), n))
}
