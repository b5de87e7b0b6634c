package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge between graft's native Catalyst expressions and the public
  * `Column` API. Spark 4 made the Column <-> Expression conversion
  * `private[sql]` (columns are ColumnNode-backed for Connect parity), so
  * extension libraries expose it from inside the `org.apache.spark.sql`
  * namespace — the same pattern third-party Spark extensions use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eager conversion — `ExpressionUtils.expression` returns a lazy
    * `ColumnNodeExpression` wrapper that only the analyzer unwraps inside
    * standard plan nodes; custom nodes (TopKPerKey) need the real catalyst
    * tree up front (the wrapper isn't serializable to executors).
    */
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)

  /** Build a DataFrame from a custom LogicalPlan (for graft's native
    * operators, e.g. TopKPerKey).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
