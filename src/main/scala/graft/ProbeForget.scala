package graft

import org.apache.spark.sql.functions._

/** Focused probe for retraction cost (the ProbeMediaStore pattern):
  * does `forget` really track the RETRACTED ids' locality instead of
  * the store size?
  *
  *  - ANN: build a 1M-vector IVF index (nlist cells), retract 1k ids
  *    that all live in ONE cell — [[graft.operators.AnnIndex.forgetIvf]]
  *    rewrites only that cell's partition. Baseline: the naive
  *    full-index rewrite (read all, anti-join, re-partition, write all)
  *    every engine without partition-scoped deletes pays.
  *  - Warehouse: a day-partitioned fact table, retract keys from one
  *    day — [[graft.warehouse.Warehouse.forget]](partitionCol) rewrites
  *    one partition vs the unpartitioned whole-table swap.
  *
  * Usage: runMain graft.ProbeForget [nVecs] [nRows]
  */
object ProbeForget {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nRows = args.drop(1).headOption.map(_.toLong).getOrElse(10000000L)
    val spark = GraftSession.getOrCreate("graft-probe-forget")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // --- ANN retraction: one-cell locality vs full rewrite
    val dir = java.nio.file.Files.createTempDirectory("graft_probe_fg").toString
    // deterministic synthetic vectors (no rand(): probe must replay)
    val vecs = spark.range(nVecs).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(31)), i =>
          (pmod(xxhash64(col("id") * 37 + i), lit(1000L)).cast("double")
            / 1000.0).cast("float")).as("embedding")) // Divide promotes to double; cast back
      .localCheckpoint(true)
    time(s"build ivf ($nVecs vecs, nlist 64)") {
      graft.operators.AnnIndex.buildIvf(vecs, "embedding", "vec_id",
        s"$dir/ann", nlist = 64, iters = 2)
    }
    val corpus = spark.read.parquet(s"$dir/ann/corpus")
    val aCell = corpus.select(col("cell_id").cast("long")).head().getLong(0)
    val victims = corpus.filter(col("cell_id").cast("long") === aCell)
      .select("vec_id").limit(1000).localCheckpoint(true)
    val nVictims = victims.count()
    def treeBytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(path)) return 0L
      val it = fs.listFiles(path, true)
      var b = 0L
      while (it.hasNext) b += it.next().getLen
      b
    }
    val removed = time(s"forgetIvf ($nVictims ids, one cell of 64)") {
      graft.operators.AnnIndex.forgetIvf(spark, s"$dir/ann", victims, "vec_id")
    }
    println(s"  removed $removed rows; corpus now ${
      spark.read.parquet(s"$dir/ann/corpus").count()}")
    println(f"  bytes rewritten: cell-scoped ${
      treeBytes(s"$dir/ann/corpus/cell_id=$aCell") / 1e6}%.0f MB of ${
      treeBytes(s"$dir/ann/corpus") / 1e6}%.0f MB total")
    // baseline: what a full-index rewrite costs at the same store size
    time("baseline full rewrite (read all, anti-join, write all)") {
      spark.read.parquet(s"$dir/ann/corpus")
        .join(victims, Seq("vec_id"), "left_anti")
        .write.mode("overwrite").partitionBy("cell_id")
        .parquet(s"$dir/ann_rebuild")
    }
    println(f"  baseline rewrote ${treeBytes(s"$dir/ann_rebuild") / 1e6}%.0f MB")

    // --- Warehouse retraction: partition-scoped vs whole-table swap
    val wh = new graft.warehouse.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft_probe_fgwh").toString)
    val rows = spark.range(nRows).select(
        col("id").as("k"),
        concat(lit("payload_"), col("id")).as("v"),
        concat(lit("d"), pmod(col("id"), lit(100L))).as("day"))
      .localCheckpoint(true)
    time(s"write fact table ($nRows rows, 100 day partitions)") {
      wh.appendPartitioned("fact", rows, "day")
    }
    val keys = spark.range(nRows).select(col("id").as("k"))
      .filter(pmod(col("k"), lit(100L)) === 7L).limit(1000)
      .localCheckpoint(true) // 1000 keys, all in day d7
    time("forget partition-scoped (1000 keys, one day of 100)") {
      wh.forget("fact", keys, "k", partitionCol = Some("day"))
    }
    wh.overwrite("fact_flat", rows) // unpartitioned twin
    time("forget unpartitioned (whole-table swap baseline)") {
      wh.forget("fact_flat", keys, "k")
    }
    spark.stop()
  }
}
