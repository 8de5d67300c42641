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

  /** Stable per-session identity (`private[sql]` on the classic
    * session; identityHashCode can collide after GC — cache-key use). */
  def sessionUUID(s: org.apache.spark.sql.SparkSession): Option[String] =
    s match {
      case c: org.apache.spark.sql.classic.SparkSession => Some(c.sessionUUID)
      case _ => None
    }
}
