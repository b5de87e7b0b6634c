package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's native Catalyst expressions and the public
  * `Column` API. Spark 4 made the Column <-> Expression conversion
  * `private[sql]` (columns are ColumnNode-backed for Connect parity), so
  * extension libraries expose it from inside the `org.apache.spark.sql`
  * namespace — the same pattern third-party Spark extensions use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
