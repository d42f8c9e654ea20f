package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static eval core for [[SortedLongIntersectCount]]: two-pointer merge
  * count over two ASCENDING long arrays — zero allocation, straight-line
  * long comparisons. Inputs MUST be sorted ascending and duplicate-free
  * (both hold for `sort_array(collect_list(...))` over distinct edges);
  * the count is then exactly |A ∩ B|.
  */
object GraphExprUtil {
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Codegen'd merge-intersection count of two sorted `array<long>`
  * columns (the triangle-closing primitive: |adj(lo) ∩ adj(hi)| per
  * oriented edge). The generic `size(array_intersect(...))` evaluates
  * interpreted with a per-row hash set and an intermediate array
  * allocation; this is one allocation-free merge pass. Same preference
  * ladder as [[TokenSimHash]]. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_long_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraphExprUtil.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.GraphExprUtil.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object GraphExpressions {
  /** Codegen'd |A ∩ B| of two sorted, duplicate-free `array<long>`s. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedLongIntersectCount(
      Bridge.expression(a), Bridge.expression(b)))
}
