package org.apache.spark.sql.graftinternal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst-Expression bridge. Spark 4 made these helpers
  * `private[sql]`, so libraries that define native expressions expose
  * them from a subpackage of `org.apache.spark.sql` — the standard
  * extension-library pattern.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
