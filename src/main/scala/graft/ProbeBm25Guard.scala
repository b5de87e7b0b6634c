package graft

import org.apache.spark.sql.functions._

/** Focused probe for the incremental BM25 append's id-guard cost (the
  * ProbeForget pattern): at a corpus size where the committed id set is
  * real, what does ONE steady-state append pay under each guard?
  *
  *  - `exact`: anti-join against the committed doc_len id column —
  *    O(corpus ids) scanned per append.
  *  - `bloom`: probe the maintained per-ingest id blooms —
  *    O(bloom bytes) read per append, independent of corpus id count.
  *
  * The batch is held tiny (100 docs) so the measured difference IS the
  * guard, not the batch's own postings work.
  *
  * Usage: runMain graft.ProbeBm25Guard [nDocs]
  */
object ProbeBm25Guard {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = GraftSession.getOrCreate("graft-probe-bm25-guard")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Retrieval
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    // deterministic synthetic docs, ~8 tokens each over a 997-word
    // vocabulary (no rand(): the probe must replay)
    def synth(from: Long, n: Long) = spark.range(from, from + n).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 8).map(i =>
        pmod(xxhash64(col("id") * 31 + i), lit(997L)).cast("string")): _*)
        .as("text"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_probe_bg").toString + "/idx"
    time(s"build incremental index ($nDocs docs)") {
      Retrieval.buildBm25Incremental(synth(0L, nDocs), "text", "doc_id", dir)
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bytesOf(sub: String): Long = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$dir/$sub"), true)
      var b = 0L
      while (it.hasNext) b += it.next().getLen
      b
    }
    println(f"  committed id column: ${bytesOf("doc_len") / 1e6}%.1f MB; " +
      f"id blooms: ${bytesOf("id_bloom") / 1e6}%.1f MB")
    // one steady-state append per guard, batch held tiny so the guard
    // dominates; fresh ids each time so both actually admit
    time("append 100 docs, idGuard=exact (anti-join the id column)") {
      Retrieval.appendBm25Incremental(spark, dir,
        synth(nDocs, 100L), "text", "doc_id")
    }
    time("append 100 docs, idGuard=bloom (probe the maintained blooms)") {
      Retrieval.appendBm25Incremental(spark, dir,
        synth(nDocs + 100L, 100L), "text", "doc_id", idGuard = "bloom")
    }
    // and the replay guarantee under the bloom: re-offering committed
    // ids admits nothing
    val readmit = Retrieval.appendBm25Incremental(spark, dir,
      synth(0L, 10000L), "text", "doc_id", idGuard = "bloom")
    println(s"  bloom replay of 10k committed ids admitted: $readmit (must be 0)")
    spark.stop()
  }
}
