package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.warehouse.Warehouse

/** Salting and bucketing: semantic equivalence plus the plan properties
  * that make them worth using.
  */
class ScaleToolsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join (incl. skewed hot key)") {
    val big = (1 to 10000).map(i => (if (i % 10 == 0) 1L else i.toLong, i)).toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "b"), (77L, "c")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .as[(Long, Int, String)].collect().sorted.toSeq
    val salted = Skew.saltedEquiJoin(big, small, "k", buckets = 8)
      .select("k", "v", "name").as[(Long, Int, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.count(_._1 == 1L) == 1001) // the hot key really is hot (multiples of 10, plus i=1)
  }

  test("partitioned fact: run_id readback prunes partitions at the scan") {
    val wh = new Warehouse(spark, tempDir("pwh"))
    val rows = (1 to 1000).map(i => (i.toLong, s"run_${i % 5}")).toDF("v", "run_id")
    wh.appendPartitioned("fact_p", rows, "run_id")
    val q = wh.read("fact_p").filter(col("run_id") === "run_3")
    assert(q.count() == 200)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(run_id"), scan)
    // only one of five partition directories is read
    assert(q.queryExecution.executedPlan.collectLeaves().toString.contains("run_id"))
  }

  test("dynamic partition overwrite: backfilled partition replaced, others untouched") {
    val wh = new Warehouse(spark, tempDir("dpo"))
    val init = Seq((1L, "d1"), (2L, "d1"), (3L, "d2"), (4L, "d3")).toDF("v", "day")
    wh.overwritePartitions("fact_d", init, "day")
    // backfill day d2 only — d1/d3 files must survive, d2 fully replaced
    val backfill = Seq((30L, "d2"), (31L, "d2")).toDF("v", "day")
    wh.overwritePartitions("fact_d", backfill, "day")
    val out = wh.read("fact_d").select("v", "day")
      .as[(Long, String)].collect().sorted.toSeq
    assert(out == Seq((1L, "d1"), (2L, "d1"), (4L, "d3"), (30L, "d2"), (31L, "d2")))
    // conf restored
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      .forall(_ != "dynamic"))
  }

  test("bucketed tables join without exchange") {
    val wh = new Warehouse(spark, tempDir("bwh"))
    val fact = (1 to 5000).map(i => (i.toLong % 100, i.toLong)).toDF("k", "v")
    val dim = (0 until 100).map(i => (i.toLong, s"name_$i")).toDF("k", "name")
    wh.writeBucketed("fact_b", fact, Seq("k"), buckets = 8)
    wh.writeBucketed("dim_b", dim, Seq("k"), buckets = 8)

    val joined = wh.readBucketed("fact_b").join(
      wh.readBucketed("dim_b").hint("merge"), Seq("k"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan) // bucket-co-located join
    assert(joined.count() == 5000)
  }
}
