package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. In Spark 4 the public `Column` no longer
  * exposes its Catalyst expression; the conversion lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`.
  * This shim (in an org.apache.spark.sql subpackage, the standard pattern
  * for Spark extension libraries) re-exports just the two conversions the
  * graft custom expressions need.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
