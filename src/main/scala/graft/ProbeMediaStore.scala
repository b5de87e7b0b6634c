package graft

import org.apache.spark.sql.functions._

/** Focused probe for the media hash store's screen cost (standalone, the
  * ProbeDriftedCell pattern): build a store of N synthetic perceptual
  * hashes, then screen a SERVICE-sized batch (8 units) and a BULK batch
  * (thousands) against it — the shipped flat layout pays one store scan
  * per screen against the broadcast batch, so per-unit cost is
  * store/|batch|.
  *
  * This probe is also where the banded-on-disk alternative (rows
  * exploded per pigeonhole block, parquet partitioned by a 1024-way band
  * bucket, screens pruned to the batch's buckets) was measured and
  * REJECTED: at 1M units the flat scan won 2.2 s vs 4.3 s (8-unit
  * batch) and 1.4 s vs 14.2 s (10k-unit batch) — full-recall screening
  * must consider candidates from every block, so bucket pruning can
  * only help when blocks·|batch| ≪ buckets, while every other screen
  * pays the blocks-× row explosion plus 1024 directories of small-file
  * overhead. See MediaHashStore's scaladoc for the record.
  *
  * Usage: runMain graft.ProbeMediaStore [storeUnits] [bulkUnits]
  */
object ProbeMediaStore {
  def main(args: Array[String]): Unit = {
    val nStore = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nBulk = args.drop(1).headOption.map(_.toInt).getOrElse(10000)
    val spark = GraftSession.getOrCreate("graft-probe-mediastore")
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft_probe_ms").toString
    // synthetic unit hashes: random 64-bit signatures + random grids —
    // collision structure does not matter here, scan cost does; the
    // batches are sampled FROM the store so matches exist and the
    // verify stage runs for real
    val units = spark.range(nStore).select(
        col("id").as("fid"),
        transform(sequence(lit(0), lit(71)),
          i => pmod(xxhash64(col("id") * 73 + i), lit(255001L)).cast("int"))
          .as("grid"),
        xxhash64(col("id"), lit("sig")).as("dhash"))
      .localCheckpoint(true)
    graft.operators.MediaHashStore.append(spark, dir, units)
    val (fb, fa) = graft.operators.MediaHashStore.compact(spark, dir)
    println(s"  store: $nStore units flat, compacted $fb -> $fa files")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.1f s, $rows rows")
    }
    val service = units.filter(col("fid") % (nStore / 8) === 1).localCheckpoint(true)
    val bulk = units.filter(col("fid") % (nStore / nBulk) === 2).localCheckpoint(true)
    time("screen_service")(graft.operators.MediaHashStore
      .screenUnits(spark, dir, service, "fid").count())
    time("screen_bulk")(graft.operators.MediaHashStore
      .screenUnits(spark, dir, bulk, "fid").count())
    spark.stop()
  }
}
