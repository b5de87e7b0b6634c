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

  test("idempotentAppend partitioned path: dedup scoped to touched runs, " +
    "partitioned layout on disk, prune-shaped scan, key precondition") {
    val dir = tempDir("ipa")
    val wh = new Warehouse(spark, dir)
    val keys = Seq("run", "batch_id", "store")
    def rows(run: String, n: Int) =
      (1 to n).map(i => (run, i.toLong, s"s$i", 10L))
        .toDF("run", "batch_id", "store", "removed_count")
    assert(wh.idempotentAppend("audit_p", rows("r1", 5), keys,
      partitionCol = Some("run")).inserted == 5)
    assert(wh.idempotentAppend("audit_p", rows("r2", 5), keys,
      partitionCol = Some("run")).inserted == 5)
    // a replayed batch re-offers r1's keys — nothing appends, and the
    // dedup only had to read r1's partition to know it
    assert(wh.idempotentAppend("audit_p", rows("r1", 5), keys,
      partitionCol = Some("run")).inserted == 0)
    assert(wh.read("audit_p").count() == 10)
    // the table really is laid out partitioned by run
    assert(new java.io.File(s"$dir/audit_p").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("run=")) == 2)
    // the dedup's scoped-read shape (isin over the batch's runs) prunes
    // at the partition index — an append-forever audit table stays
    // O(batch) to append to (r11 verdict #6)
    val scoped = wh.read("audit_p").filter(col("run").isin("r1"))
    val plan = scoped.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(run"), plan)
    // a partition column outside the key would dodge the scoped dedup —
    // refused up front
    val e = intercept[IllegalArgumentException] {
      wh.idempotentAppend("audit_p", rows("r3", 1), Seq("batch_id"),
        partitionCol = Some("run"))
    }
    assert(e.getMessage.contains("part of the key"))
  }

  test("idempotentAppend layout reconciliation: a pre-partitioning flat table " +
    "degrades safely; a layout mismatch refuses") {
    val dir = tempDir("ipa_layout")
    val wh = new Warehouse(spark, dir)
    val keys = Seq("run", "batch_id", "store")
    def rows(run: String, n: Int) =
      (1 to n).map(i => (run, i.toLong, s"s$i", 10L))
        .toDF("run", "batch_id", "store", "removed_count")
    // the table is born FLAT (a deployment that audited before its
    // caller adopted partitionCol)
    assert(wh.idempotentAppend("audit_f", rows("r1", 5), keys).inserted == 5)
    // a later partitionCol request must NOT write run= directories
    // beside the flat files — mixed parquet depths break every read;
    // it degrades to the flat path (dedup still exact, prune lost)
    assert(wh.idempotentAppend("audit_f", rows("r2", 5), keys,
      partitionCol = Some("run")).inserted == 5)
    assert(wh.idempotentAppend("audit_f", rows("r1", 5), keys,
      partitionCol = Some("run")).inserted == 0) // replay still dedups
    assert(!new java.io.File(s"$dir/audit_f").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("run=")),
      "a flat table must stay flat")
    assert(wh.read("audit_f").count() == 10) // and stays readable
    // the reverse has no safe degradation: flat rows into a partitioned
    // table would mix depths the other way — refused loudly
    assert(wh.idempotentAppend("audit_q", rows("r1", 3), keys,
      partitionCol = Some("run")).inserted == 3)
    val e = intercept[IllegalArgumentException] {
      wh.idempotentAppend("audit_q", rows("r2", 3), keys)
    }
    assert(e.getMessage.contains("partitioned by"))
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
