package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order clustering: interleave arithmetic, and the skipping property —
  * z-ordered partitions have small bounding boxes in BOTH dimensions,
  * where a linear sort shrinks only its leading column.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave_bits puts a-bits at even and b-bits at odd positions") {
    val r = Seq((5L, 3L)).toDF("a", "b")
      .select(graft.functions.interleave_bits(col("a"), col("b"), 3))
      .head().getLong(0)
    // a=101 -> bits 0,4; b=011 -> bits 1,3  =>  1+2+8+16 = 27
    assert(r == 27L)
    val inv = Seq((3L, 5L)).toDF("a", "b")
      .select(graft.functions.interleave_bits(col("a"), col("b"), 3))
      .head().getLong(0)
    assert(inv != r) // not symmetric: dimensions occupy distinct bit lanes
  }

  test("z-ordered layout prunes on the non-leading column; linear sort cannot") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    // fraction of partitions whose min/max box overlaps l_suppkey = 3 —
    // exactly what parquet row-group stats pruning would scan
    def scanFraction(laidOut: org.apache.spark.sql.DataFrame): Double = {
      val b = ZOrder.partitionBounds(laidOut, "l_partkey", "l_suppkey")
        .filter(col("n") > 0)
        .select(col("min_b"), col("max_b")).collect()
      b.count(r => r.getLong(0) <= 3L && 3L <= r.getLong(1)).toDouble / b.length
    }
    val z = scanFraction(ZOrder.zOrdered(li, "l_partkey", "l_suppkey", numFiles = 16))
    val linear = scanFraction(li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey"))
    // every linear partition spans the full l_suppkey range -> no pruning;
    // the z-order curve confines l_suppkey = 3 to a minority of partitions
    assert(linear > 0.9, s"linear layout unexpectedly pruned: $linear")
    assert(z <= 0.5, s"z-order scan fraction $z vs linear $linear")
  }

  test("zcode is deterministic under repartitioning") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    def codes(parts: Int): Array[Long] =
      ZOrder.withZCode(li.repartition(parts), "l_partkey", "l_suppkey")
        .select("zcode").as[Long].collect().sorted
    assert(codes(3).sameElements(codes(11)))
  }
}
