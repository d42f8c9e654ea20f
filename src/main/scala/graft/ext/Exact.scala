package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared exact-integer-arithmetic carriers for the read-out family
  * ([[Eval]], [[Spectral]], [[Drift]]): every ppm/micro statistic in
  * the shelf is defined as exact integer arithmetic so it hash-gates
  * across engines — but a 64-bit accumulator silently caps the DESIGN
  * scale. A Long sum of per-row micro² terms wraps (ANSI off) or
  * throws (ANSI on) near 10⁶–10⁹ adversarial rows, three orders of
  * magnitude under the 100 TB point, and a `(sum * 1000000) div n²`
  * ppm fold overflows ~10⁶× earlier than the sum itself.
  *
  * The fix is structural, not a documented bound: every sum and every
  * ×10⁶ scaling in the family runs in DECIMAL(38,0) — exact to 10³⁸,
  * i.e. past any corpus that physically fits a cluster — and only the
  * final read-outs come back to BIGINT. Spark's decimal aggregation is
  * codegen'd and a single extra decimal column is negligible against
  * the scan, so the lift costs nothing measurable (Bench r14 vs r13
  * on the eval shelf is flat).
  *
  * Read-out contract: quotient-style outputs (ppm, micro means) fit
  * BIGINT by construction and cast straight back; magnitude-style
  * outputs (raw exact sums exposed for composition) go through
  * [[asLongOrFail]], which keeps the BIGINT schema the oracle gate
  * hashes but FAILS LOUDLY — never wraps — if the exact value has
  * outgrown 64 bits.
  */
object Exact {

  /** The carrier type: widest decimal Spark supports, scale 0. */
  val Dec = "decimal(38,0)"

  /** Exact decimal view of an integral column/expression. */
  def dec(c: Column): Column = c.cast(Dec)

  /** Exact decimal SUM of an integral per-row term, 0 when empty —
    * the overflow-proof replacement for `coalesce(sum(c), lit(0L))`. */
  def decSum(c: Column): Column = coalesce(sum(dec(c)), lit(0L).cast(Dec))

  /** SQL for an exact floor division `num / den` that STAYS on the
    * DECIMAL carrier. Spark's `a div b` narrows to BIGINT and — on
    * this build, ANSI on — silently WRAPS when the quotient exceeds
    * 2⁶³ (`CAST(1e35 AS DECIMAL(38,0)) div 3` returns a garbage Long
    * with no error; verified empirically). Subtracting the remainder
    * first makes the decimal division exact, so the quotient is
    * representable to 10³² (the division result type is
    * DECIMAL(38,6)) and overflows LOUDLY (ANSI
    * NUMERIC_VALUE_OUT_OF_RANGE) beyond — never silently.
    *
    * Contract: `num` ≥ 0 and `den` > 0 (Spark's `%` takes the
    * dividend's sign, so negative numerators would truncate toward
    * zero, not floor — every caller in the shelf divides squared or
    * count-like quantities). The contract is ENFORCED in the emitted
    * SQL: a negative numerator or non-positive denominator
    * raise_error's instead of silently mis-flooring — the exact
    * failure class this helper exists to eliminate must not be
    * reintroducible by a future sign-indefinite caller. The guard is
    * a scalar CASE on values already in flight, so it adds no scan,
    * shuffle, or job.
    */
  def divFloorSql(num: String, den: String): String = {
    val n = s"(CASE WHEN ($num) < 0 THEN CAST(raise_error(" +
      "'Exact.divFloorSql: negative numerator violates the num >= 0 " +
      s"floor-division contract') AS $Dec) ELSE ($num) END)"
    val d = s"(CASE WHEN ($den) <= 0 THEN CAST(raise_error(" +
      "'Exact.divFloorSql: non-positive denominator violates the " +
      s"den > 0 floor-division contract') AS $Dec) ELSE ($den) END)"
    s"CAST(($n - $n % $d) / $d AS $Dec)"
  }

  /** Read an exact DECIMAL value back out as BIGINT, failing LOUDLY
    * when it no longer fits — the schema-stable alternative to a
    * silent wrap (ANSI off) or an anonymous ARITHMETIC_OVERFLOW (ANSI
    * on) deep inside a stage. `what` names the read-out in the error
    * so the operator, not the engine, explains itself. */
  def asLongOrFail(c: Column, what: String): Column =
    when(c > lit(Long.MaxValue) || c < lit(Long.MinValue),
      raise_error(lit(s"$what exceeds the BIGINT read-out range — " +
        "the exact DECIMAL(38,0) value is computed but cannot be " +
        "exposed through this 64-bit column; read the ppm/mean " +
        "read-outs (always in range) or widen the output schema"))
        .cast("long"))
      .otherwise(c.cast("long"))
}
