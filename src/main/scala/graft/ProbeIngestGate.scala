package graft

import org.apache.spark.sql.functions._

/** Measures the streaming lanes' committed-id K2 gate
  * ([[graft.streaming.IncrementalStream.gateCommittedIds]]) against a
  * growing committed corpus — the r12 verdict's "gate cost flat vs
  * committed-doc count" criterion for the decontam / fuzzy-dedup lanes,
  * whose per-batch anti-join used to read EVERY committed id.
  *
  * Protocol (the ProbeAppend shape): commit N doc ids as a partitioned
  * parquet id table (several ingest dirs, like a real lane's layout),
  * then time the gate for a fixed 500-doc batch in the LIVE-FEED shape
  * (ids monotone with the feed): 250 re-delivered ids just under the
  * committed max — the window overlaps real row groups, so the read
  * cannot no-op — plus 250 fresh ids just above it. Run with 5k / 200k
  * / 1M committed docs and compare wall times — the between() prune
  * keeps the read at the overlapping row groups, so the time should
  * track the batch, not N. (The prune spans the batch's [min, max]: a
  * batch with scattered ids widens it — the SpanStore.append caveat;
  * feeds with monotone ids, the streaming case, keep it tight.)
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
    val per = math.max(committedN / ingests, 1L)
    time(s"commit $committedN ids across $ingests ingests") {
      (0 until ingests).foreach { i =>
        spark.range(i * per, math.min((i + 1) * per, committedN))
          .select(col("id").as("doc_id"),
            concat(lit("committed doc "), col("id")).as("text"))
          .write.mode("overwrite").parquet(s"$dir/docs/ingest=i$i")
      }
    }
    val committed = spark.read.parquet(
      (0 until ingests).map(i => s"$dir/docs/ingest=i$i"): _*)
    // batch: 250 re-delivered ids just under the committed max + 250 fresh
    val batch = spark.range(committedN - 250L, committedN)
      .unionByName(spark.range(committedN, committedN + 250L))
      .select(col("id").as("doc_id"),
        concat(lit("batch doc "), col("id")).as("text"))
      .localCheckpoint(true)
    // warm the FS/footer caches once, then measure
    (1 to 3).foreach { i =>
      val kept = time(s"gate pass $i (500-doc batch vs $committedN committed)") {
        graft.streaming.IncrementalStream
          .gateCommittedIds(batch, committed, "doc_id", "text")
          .count()
      }
      require(kept == 250L, s"gate admitted $kept of the 250 fresh docs")
    }
    spark.stop()
  }
}
