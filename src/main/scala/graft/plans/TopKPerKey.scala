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
                      maxKeysInMemory: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey = copy(child = c)
}

/** Memory contract: the partial stage holds at most `maxKeysInMemory`
  * heaps (k rows each); when a task sees more distinct keys, the current
  * heaps are DRAINED DOWNSTREAM and the map restarts — the same fallback
  * contract as partial hash aggregation, correct because the final stage
  * re-reduces whatever reaches it (a key may then contribute more than k
  * rows per task to the shuffle, but never more than k per flush). The
  * final stage holds one heap per distinct key of its partition — bounded
  * by key cardinality / shuffle parallelism, the usual hash-agg bound.
  */
case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                          maxKeysInMemory: Int, partial: Boolean,
                          child: SparkPlan) extends UnaryExecNode {
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
    val flushAt = if (partial) maxKeysInMemory else Int.MaxValue
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(orderLocal, childOutput) // ascending = "first"
      // per key: bounded max-heap (reverse ordering) keeping the k first
      // rows under `ord`
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()

      def drainHeaps(): Iterator[InternalRow] = {
        val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
        heaps.values.forEach { h =>
          val rows = new Array[InternalRow](h.size)
          var i = rows.length - 1
          while (i >= 0) { rows(i) = h.poll(); i -= 1 } // drain max-heap -> ascending
          out ++= rows
        }
        heaps.clear()
        out.iterator
      }

      new Iterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty
        private var inputDone = false

        @annotation.tailrec
        private def advance(): Unit =
          if (!pending.hasNext && !inputDone) {
            if (!iter.hasNext) {
              inputDone = true
              pending = drainHeaps() // end of input: emit everything held
            } else {
              // consume input until the key map overflows (partial only)
              var overflow = false
              while (iter.hasNext && !overflow) {
                val row = iter.next()
                val key = keyProj(row)
                var heap = heaps.get(key)
                if (heap == null) {
                  heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ord.reverse)
                  heaps.put(key.copy(), heap)
                  overflow = heaps.size > flushAt
                }
                if (heap.size < kLocal) heap.add(row.copy())
                else if (ord.compare(row, heap.peek()) < 0) {
                  heap.poll()
                  heap.add(row.copy())
                }
              }
              if (overflow) pending = drainHeaps()
              advance()
            }
          }

        override def hasNext: Boolean = { advance(); pending.hasNext }
        override def next(): InternalRow = { advance(); pending.next() }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec = copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, maxKeys, child) =>
      // partial below, final above; EnsureRequirements adds the hash
      // exchange between them (at most k rows per key per map task flow)
      TopKPerKeyExec(k, keys, order, maxKeys, partial = false,
        TopKPerKeyExec(k, keys, order, maxKeys, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** User-facing entry point. */
object TopK {
  /** First `k` rows per key under `orderBy` (use `.desc`/`.asc` Columns).
    * Output contains all input columns, ≤ k rows per key, ordered within
    * each key. `maxKeysInMemory` bounds the partial stage's heap map (see
    * [[TopKPerKeyExec]]): map-side memory never exceeds
    * maxKeysInMemory × k row copies regardless of key cardinality.
    */
  def perKey(df: DataFrame, keys: Seq[Column], orderBy: Seq[Column], k: Int,
             maxKeysInMemory: Int = 1 << 16): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    val sortOrders = orderBy.map(c => ColumnBridge.expression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    val node = TopKPerKey(k, keys.map(ColumnBridge.expression),
      sortOrders, maxKeysInMemory, df.queryExecution.analyzed)
    ColumnBridge.ofRows(spark, node)
  }
}
