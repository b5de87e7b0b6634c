package graft

import org.apache.spark.sql.functions._

/** Characterizes [[graft.operators.Dedup.spanMask]] at corpus scale —
  * the r12 verdict's ask: the rewrite's localCheckpointed sliding-
  * shingle stream materializes O(corpus tokens) rows per run (inherent
  * to substring dedup — every token position is a span start), and this
  * probe states that shape with numbers instead of leaving it implied.
  *
  * Protocol: id-shifted corpus copies (the ProbeSpanStore protocol —
  * REAL duplicated text across copies, so the mask has genuinely hot
  * spans and the coverage explode carries real weight), sweep the
  * replication factor, and report wall time, the materialized span-
  * stream row count, and the checkpointed block bytes
  * (`getRDDStorageInfo` — memory + disk across the run's cached RDDs,
  * read at peak right after the action).
  *
  *   sbt "runMain graft.ProbeSpanMask /root/testdata/sf0.1 4"
  */
object ProbeSpanMask {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicate = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val spark = GraftSession.getOrCreate("graft-probe-spanmask")
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val baseShift = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val docs = (if (replicate <= 1) base
      else (0 until replicate).map(i =>
          base.select((col("doc_id") + lit(i * baseShift)).as("doc_id"),
            col("text")))
        .reduce(_.unionByName(_)))
      .localCheckpoint(true)
    val nDocs = docs.count()
    val nTokens = docs
      .agg(sum(size(graft.operators.TextAnalysis.tokens(col("text")))))
      .head().getLong(0)
    val nSpans = graft.operators.Dedup
      .spanShingles(docs, "text", "doc_id", 8).count()
    val t0 = System.nanoTime()
    val stats = graft.operators.Dedup.spanMask(docs, "text", "doc_id")
      .agg(count(lit(1)), sum(col("masked_tokens"))).head()
    val secs = (System.nanoTime() - t0) / 1e9
    // peak checkpointed footprint: every cached RDD block alive right
    // after the action (the span stream + the mask family's occ/keeper
    // checkpoints) — memory and disk both count; local mode spills to
    // /dev/shm, a cluster would spill to executor disks
    val storage = spark.sparkContext.getRDDStorageInfo
    val bytes = storage.map(i => i.memSize + i.diskSize).sum
    println(f"  docs=$nDocs tokens=$nTokens spans=$nSpans " +
      f"masked_tokens=${stats.getLong(1)} wall=$secs%.1f s " +
      f"checkpointed=${bytes / 1048576.0}%.1f MiB over ${storage.length} RDDs")
    spark.stop()
  }
}
