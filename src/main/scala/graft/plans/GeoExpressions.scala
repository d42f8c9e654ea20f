package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native WGS-84 geodesic (Vincenty inverse) distance, rounded HALF_EVEN
  * to 3 decimals — the reference's STORED ride distance (geopy geodesic,
  * reference: src/data_load_sqlite.py:100–111, rounded at :109).
  *
  * The iterative Vincenty solve can't be written from built-in column
  * functions (data-dependent loop), so this follows the same preference
  * ladder as [[FloatVectorDot]]/[[TokenSimHash]]: a custom Expression
  * whose generated code is one static call into [[graft.functions.Geo]]
  * — stays inside whole-stage codegen, no UDF serialization, no row-level
  * Scala function dispatch. NULL coordinates propagate to NULL; the
  * (never-at-city-scale) non-converged case surfaces as NULL exactly like
  * the reference's raises→NaN handling.
  */
case class GeodesicKm(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires four double arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // non-convergence → NULL
  override def prettyName: String = "geodesic_km"

  override def nullSafeEval(lat1: Any, lon1: Any, lat2: Any, lon2: Any): Any = {
    val d = graft.functions.Geo.geodesicRoundedOrNaN(
      lat1.asInstanceOf[Double], lon1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lon2.asInstanceOf[Double])
    if (d.isNaN) null else d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat1, lon1, lat2, lon2) => {
      val d = ctx.freshName("gd")
      s"""
         |double $d = graft.functions.Geo.geodesicRoundedOrNaN($lat1, $lon1, $lat2, $lon2);
         |if (Double.isNaN($d)) { ${ev.isNull} = true; } else { ${ev.value} = $d; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): GeodesicKm =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

object GeoExpressions {

  /** Codegen'd Vincenty geodesic distance (km, 3-dp HALF_EVEN). */
  def geodesicKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    Bridge.column(GeodesicKm(
      Bridge.expression(lat1.cast("double")), Bridge.expression(lon1.cast("double")),
      Bridge.expression(lat2.cast("double")), Bridge.expression(lon2.cast("double"))))
}
