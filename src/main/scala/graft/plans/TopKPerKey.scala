package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.graft.ColumnBridge

/** Top-k-per-key as a first-class physical operator.
  *
  * Spark expresses "top k rows per group" as
  * `row_number().over(Window.partitionBy(key).orderBy(ord)) <= k`, which
  * shuffles EVERY candidate row and fully sorts each partition. At
  * 100 TB / billions of candidates per query key that shape is the
  * bottleneck: shuffle bytes scale with the candidate count, not with k.
  *
  * This operator plans as two bounded-heap passes:
  *
  *   TopKPerKeyExec(final)            <- k rows per key, total order per key
  *     +- Exchange hash(key)          <- shuffles at most k rows per key
  *        +- TopKPerKeyExec(partial)  <- map-side: k rows per key per task
  *           +- child
  *
  * i.e. the same partial/final contract as HashAggregate, applied to order
  * statistics. Memory is O(keys-per-task * k) UnsafeRow copies; no sort of
  * the full input ever happens.
  *
  * The pattern follows Spark's own public extension API: a LogicalPlan
  * node, a Strategy that plans it, and EnsureRequirements inserting the
  * exchange from `requiredChildDistribution` (see the SparkStrategy docs
  * in org.apache.spark.sql.execution).
  */
case class TopKPerKey(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                      child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey = copy(child = c)
}

case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(orderLocal, childOutput) // ascending = "first"
      // per key: bounded max-heap (reverse ordering) keeping the k first
      // rows under `ord`
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values.forEach { h =>
        val rows = new Array[InternalRow](h.size)
        var i = rows.length - 1
        while (i >= 0) { rows(i) = h.poll(); i -= 1 } // drain max-heap -> ascending
        out ++= rows
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec = copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      // partial below, final above; EnsureRequirements adds the hash
      // exchange between them (at most k rows per key per map task flow)
      TopKPerKeyExec(k, keys, order, partial = false,
        TopKPerKeyExec(k, keys, order, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** User-facing entry point. */
object TopK {
  /** First `k` rows per key under `orderBy` (use `.desc`/`.asc` Columns).
    * Output contains all input columns, ≤ k rows per key, ordered within
    * each key.
    */
  def perKey(df: DataFrame, keys: Seq[Column], orderBy: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    val sortOrders = orderBy.map(c => ColumnBridge.expression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    val node = TopKPerKey(k, keys.map(ColumnBridge.expression),
      sortOrders, df.queryExecution.analyzed)
    ColumnBridge.ofRows(spark, node)
  }
}
