package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column↔Expression conversion — the
  * standard pattern for libraries that define native Catalyst
  * expressions (the public API intentionally hides Expression since
  * Spark 4's Connect split). Lives under org.apache.spark.sql to
  * satisfy the `private[sql]` qualifier. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
