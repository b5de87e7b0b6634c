package graft

import org.apache.spark.sql.functions._

/** Focused probe for the drifted-index hot-cell A/B (the ScaleProbe
  * round-8 block, runnable alone while iterating on the join shape):
  * build a small IVF index, append a mass of near-identical vectors —
  * all route to ONE cell under the frozen centroids — and bulk-query
  * with probes into that cell. The unsplit cell_id equi-join funnels
  * |hot cell| × |probes| cosine evaluations through one task; the
  * occupancy-derived sub-split (AnnIndex.cellCandidates) spreads the
  * same work across ⌈|cell| / maxCellRows⌉ pinned partitions.
  *
  * Usage: runMain graft.ProbeDriftedCell [hotRows] [nQueries]
  */
object ProbeDriftedCell {
  def main(args: Array[String]): Unit = {
    val hotRows = args.headOption.map(_.toLong).getOrElse(100000L)
    val nQ = args.drop(1).headOption.map(_.toInt).getOrElse(300)
    val spark = GraftSession.getOrCreate("graft-probe-drift")
    val embs = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val idxDir = java.nio.file.Files.createTempDirectory("graft_probe_drift").toString
    graft.operators.AnnIndex.buildIvf(embs, "embedding", "vec_id", idxDir,
      nlist = 16, iters = 3)
    val v0 = embs.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val hot = spark.range(10000000L, 10000000L + hotRows).select(
        col("id").as("vec_id"),
        transform(typedLit(v0), (x, i) =>
          (x.cast("double") + pmod(col("id") + i * 7, lit(101)).cast("double") / 1e4)
            .cast("float")).as("embedding"))
      .localCheckpoint(true)
    graft.operators.AnnIndex.appendIvf(hot, "embedding", "vec_id", idxDir)
    val drift = graft.operators.AnnIndex.routingDrift(spark, idxDir)
      .agg(sum(col("abs_diff")) / 2).head().getDouble(0)
    println(f"  drifted index TVD: $drift%.3f")
    val hotQs = hot.filter(col("vec_id") % (hotRows / nQ) === 0)
      .localCheckpoint(true)
    // emulate the bulk contract's SHUFFLE regime: at production scale the
    // probe side is corpus-sized and never broadcasts — the fixture's
    // probe table would, hiding the reducer funnel this A/B measures
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.1f s, $rows rows")
    }
    // temporary stage instrumentation (GRAFT_PROBE_STAGES=1)
    if (sys.env.contains("GRAFT_PROBE_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            println(f"    stage ${si.stageId}%3d tasks=${si.numTasks}%4d " +
              f"wall=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3}%.1f s " +
              si.name.take(60))
          }
        })
    if (sys.env.contains("GRAFT_PROBE_EXPLAIN")) {
      graft.operators.AnnIndex.queryIvfBulk(
        spark, idxDir, hotQs, "embedding", "vec_id", k = 3, nprobe = 1,
        maxCellRows = 1L << 14).explain("formatted")
    }
    time("ann_bulk_drifted_nosplit")(graft.operators.AnnIndex.queryIvfBulk(
      spark, idxDir, hotQs, "embedding", "vec_id", k = 3, nprobe = 1,
      maxCellRows = Long.MaxValue).count())
    time("ann_bulk_drifted_split")(graft.operators.AnnIndex.queryIvfBulk(
      spark, idxDir, hotQs, "embedding", "vec_id", k = 3, nprobe = 1,
      maxCellRows = 1L << 14).count())
    spark.stop()
  }
}
