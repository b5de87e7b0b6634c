package graft

import org.apache.spark.sql.functions._

/** Focused probe for serving-stack GROWTH cost (the ProbeForget pattern,
  * pointed at the other direction): does `RetrievePipeline.append` +
  * `appendBm25Incremental` really track the BATCH size instead of the
  * stack size?
  *
  *  - Build the full hybrid serving stack over the sf corpus once.
  *  - Append a small synthetic batch — the steady-state operation a
  *    live pipeline pays per drain — and measure wall time and bytes
  *    written against the full-rebuild baseline every engine without
  *    incremental index maintenance pays for the same outcome.
  *
  * Usage: runMain graft.ProbeAppend [sfDir] [batchDocs] [replicate]
  * [rebuildBaseline]
  * (`replicate` stacks id-shifted copies of the sf corpus so the probe
  * can measure the append at a corpus size where rebuild cost is real;
  * `rebuildBaseline=false` skips the full-rebuild control at sizes
  * where it would dominate the probe's wall time)
  *
  * Both id-guard modes are measured on ONE stack (two disjoint fresh
  * batches, appended exact then bloom — the second append sees one
  * extra committed part, a negligible asymmetry), so the r11 question
  * "does the guard make append wall-time flat in corpus size" reads
  * directly off runs at increasing `replicate`.
  */
object ProbeAppend {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchN = args.drop(1).headOption.map(_.toLong).getOrElse(500L)
    val replicate = args.drop(2).headOption.map(_.toInt).getOrElse(1)
    val rebuildBaseline = args.drop(3).headOption.forall(_.toBoolean)
    val spark = GraftSession.getOrCreate("graft-probe-append")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    def treeBytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(path)) return 0L
      val it = fs.listFiles(path, true)
      var b = 0L
      while (it.hasNext) b += it.next().getLen
      b
    }

    val base = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // shift copies by max(id)+1, NOT row count: sparse ids would make
    // count-shifted copies collide and double tf/dl for those docs —
    // distorting exactly the measurement this probe takes
    val baseShift = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val docs = (if (replicate <= 1) base
      else (0 until replicate).map(i =>
          base.select((col("doc_id") + lit(i * baseShift)).as("doc_id"),
            col("text")))
        .reduce(_.unionByName(_)))
      .localCheckpoint(true)
    val nDocs = docs.count()
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    // deterministic synthetic batches with fresh ids (no rand():
    // replayable); A and B are disjoint so each append admits fully
    def freshBatch(offset: Long) = spark.range(batchN).select(
        (col("id") + maxId + 1L + offset).as("doc_id"),
        concat(lit("synthetic appended document number "), col("id") + offset,
          lit(" about streams joins vectors windows shuffles and "),
          lit("partitions with token "),
          pmod(xxhash64(col("id") + offset), lit(997L))).as("text"))
      .localCheckpoint(true)
    val batchA = freshBatch(0L)
    val batchB = freshBatch(batchN)

    val dir = java.nio.file.Files.createTempDirectory("graft_probe_ap").toString
    time(s"build serving stack ($nDocs docs)") {
      graft.pipeline.RetrievePipeline.build(docs, "text", "doc_id",
        s"$dir/grown", chunkTokens = 32, stride = 32, dim = 32,
        salt = "pa", nlist = 8, iters = 2)
    }
    val bytesBefore = treeBytes(s"$dir/grown")
    val stagesA = time(s"append ($batchN docs, idGuard=exact)") {
      graft.pipeline.RetrievePipeline.append(batchA, "text", "doc_id",
        s"$dir/grown")
    }
    println(s"  appended stages (exact): ${stagesA.mkString(", ")}")
    val stagesB = time(s"append ($batchN docs, idGuard=bloom)") {
      graft.pipeline.RetrievePipeline.append(batchB, "text", "doc_id",
        s"$dir/grown", idGuard = "bloom")
    }
    println(s"  appended stages (bloom): ${stagesB.mkString(", ")}")
    println(f"  bytes written by both appends: ${
      (treeBytes(s"$dir/grown") - bytesBefore) / 1e6}%.1f MB of ${
      treeBytes(s"$dir/grown") / 1e6}%.1f MB stack total")
    if (rebuildBaseline)
      time(s"rebuild baseline (${nDocs + batchN} docs — what a non-" +
        "incremental stack pays per arrival)") {
        graft.pipeline.RetrievePipeline.build(
          docs.select(col("doc_id"), col("text")).unionByName(batchA),
          "text", "doc_id", s"$dir/rebuilt", chunkTokens = 32, stride = 32,
          dim = 32, salt = "pa", nlist = 8, iters = 2)
      }
    spark.stop()
  }
}
