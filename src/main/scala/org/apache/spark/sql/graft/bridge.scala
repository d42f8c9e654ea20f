package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst-Expression bridge.
  *
  * Spark 4 split the public Column API from catalyst; the converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`.
  * Hosting this one-file shim inside the `org.apache.spark.sql` package
  * namespace is the standard technique third-party Spark extensions use
  * to attach custom native expressions to the Column API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
