package graft

import org.apache.spark.sql.functions._

/** Measures the streaming lanes' committed-id K2 gate
  * ([[graft.streaming.IncrementalStream.gateCommittedIds]]) against a
  * growing committed corpus — the r12 verdict's "gate cost flat vs
  * committed-doc count" criterion for the decontam / fuzzy-dedup lanes,
  * whose per-batch anti-join used to read EVERY committed id, extended
  * (r14) with the SCATTERED-id batch the between() window cannot prune:
  *
  *  1. LIVE-FEED batch (ids monotone with the feed): 250 re-delivered
  *     ids just under the committed max + 250 fresh above it. The
  *     [min, max] window prune keeps the read at the overlapping row
  *     groups — time should track the batch, not N.
  *  2. SCATTERED batch: 250 re-delivered ids sampled evenly across the
  *     WHOLE committed range + 250 fresh. The window spans everything,
  *     so the flat layout degrades to a full id scan (measured first —
  *     the honest baseline); after
  *     [[graft.streaming.IncrementalStream.compactDecontamCorpus]]
  *     builds the bucketed `gate_ids` base, the same batch prunes to
  *     its ~500 touched buckets of 4096 regardless of id distribution
  *     (r13 verdict #2).
  *
  * Run with 5k / 200k / 2M committed docs and compare wall times.
  *
  *   sbt "runMain graft.ProbeIngestGate 1000000"
  */
object ProbeIngestGate {
  def main(args: Array[String]): Unit = {
    val committedN = args.headOption.map(_.toLong).getOrElse(200000L)
    val ingests = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = GraftSession.getOrCreate("graft-probe-gate")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_probe_gate").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val per = math.max(committedN / ingests, 1L)
    val keys = (0 until ingests).map(i => s"i$i")
    time(s"commit $committedN ids across $ingests ingests") {
      keys.zipWithIndex.foreach { case (k, i) =>
        spark.range(i * per, math.min((i + 1) * per, committedN))
          .select(col("id").as("doc_id"),
            concat(lit("committed doc "), col("id")).as("text"))
          .write.mode("overwrite").parquet(s"$dir/docs/ingest=$k")
        fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/_commits"))
        fs.create(new org.apache.hadoop.fs.Path(s"$dir/_commits/$k"), true)
          .close()
      }
    }
    def gate(batch: org.apache.spark.sql.DataFrame): Long =
      graft.streaming.IncrementalStream
        .gateCommittedIds(batch, spark, dir, keys, "doc_id", "text")
        .count()
    def mkBatch(replayed: org.apache.spark.sql.Dataset[java.lang.Long]) =
      replayed.toDF("id")
        .unionByName(spark.range(committedN, committedN + 250L).toDF("id"))
        .select(col("id").as("doc_id"),
          concat(lit("batch doc "), col("id")).as("text"))
        .localCheckpoint(true)
    // live-feed shape: replays just under the committed max
    val monotone = mkBatch(spark.range(committedN - 250L, committedN))
    // scattered shape: replays spread evenly across the whole range —
    // the [min, max] window prune covers everything
    val scattered = mkBatch(
      spark.range(0L, committedN, math.max(committedN / 250L, 1L)).limit(250))
    // warm the FS/footer caches once, then measure
    (1 to 3).foreach { i =>
      val kept = time(s"monotone gate pass $i (500 docs vs $committedN committed, flat)") {
        gate(monotone)
      }
      require(kept == 250L, s"gate admitted $kept of the 250 fresh docs")
    }
    (1 to 3).foreach { i =>
      val kept = time(s"scattered gate pass $i (flat layout — full id scan)") {
        gate(scattered)
      }
      require(kept == 250L, s"gate admitted $kept of the 250 fresh docs")
    }
    time("compactDecontamCorpus (fold + bucketed gate_ids base)") {
      graft.streaming.IncrementalStream.compactDecontamCorpus(spark, dir)
    }
    val retained = Seq(s"retained_$ingests")
    def gateCompacted(batch: org.apache.spark.sql.DataFrame): Long =
      graft.streaming.IncrementalStream
        .gateCommittedIds(batch, spark, dir, retained, "doc_id", "text")
        .count()
    (1 to 3).foreach { i =>
      val kept = time(s"scattered gate pass $i (bucketed base — partition-pruned)") {
        gateCompacted(scattered)
      }
      require(kept == 250L, s"gate admitted $kept of the 250 fresh docs")
    }
    spark.stop()
  }
}
