package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bucketized band join vs the brute-force all-pairs model on random
  * timestamps, boundary inclusivity, zero-count retention, and the plan
  * shape that justifies the operator's existence (equi-join on the bin
  * key, no nested loop).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tsDf(ids: Seq[(Long, Long)]) = // (id, epoch micros)
    ids.toDF("id", "us").select(col("id"), timestamp_micros(col("us")).as("ts"))

  test("band join equals brute-force model on random timestamps") {
    val rnd = new scala.util.Random(7)
    val base = 1700000000000000L // positive epoch, 2023-ish
    val left = (1L to 120L).map(i => i -> (base + rnd.nextLong(10000000L)))
    val right = (1L to 300L).map(i => i -> (base + rnd.nextLong(10000000L)))
    val (lo, hi) = (-250000L, 750000L) // asymmetric band, negative lo
    val got = RangeJoin.bandJoin(
        tsDf(left).select(col("id").as("lid"), col("ts").as("lts")),
        tsDf(right).select(col("id").as("rid"), col("ts").as("rts")),
        col("lts"), col("rts"), lo, hi)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = (for {
      (li, lt) <- left
      (ri, rt) <- right
      if rt >= lt + lo && rt <= lt + hi
    } yield (li, ri)).toSet
    assert(got == want)
  }

  test("bounds are inclusive and exact at bin edges") {
    val w = 1000000L
    // right rows exactly AT lo/hi offsets and one just outside each —
    // and a left ts exactly on a bin boundary
    val left = tsDf(Seq(1L -> 5 * w))
    val right = tsDf(Seq(
      10L -> (5 * w),          // at lo (offset 0)
      11L -> (6 * w),          // at hi exactly
      12L -> (6 * w + 1),      // 1 µs past hi
      13L -> (5 * w - 1)))     // 1 µs before lo
    val got = RangeJoin.bandJoin(
        left.select(col("id").as("lid"), col("ts").as("lts")),
        right.select(col("id").as("rid"), col("ts").as("rts")),
        col("lts"), col("rts"), 0L, w)
      .select("rid").as[Long].collect().toSet
    assert(got == Set(10L, 11L))
  }

  test("countInBand keeps zero-count left rows; plan has no nested loop") {
    val left = tsDf(Seq(1L -> 1000000L, 2L -> 900000000L))
    val right = tsDf(Seq(10L -> 1100000L))
    val out = RangeJoin.countInBand(
      left.withColumnRenamed("id", "event_id"), right,
      "event_id", col("ts"), col("ts"), 0L, 1000000L)
    val rows = out.orderBy("event_id").as[(Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 1L), (2L, 0L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
