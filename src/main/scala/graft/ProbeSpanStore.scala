package graft

import org.apache.spark.sql.functions._

/** Scale probe for the persisted span store: do [[graft.operators
  * .SpanStore.probe]] and `.append` track the BATCH size instead of the
  * store size? (The ProbeAppend question pointed at the span family.)
  *
  *  - Build the store over the (optionally replicated) sf corpus.
  *  - Probe + append a fixed-size batch; wall time should be flat in
  *    store size: the probe's committed read is vocabulary-pruned (a
  *    broadcast semi-join against the batch's span hashes) and the
  *    append's gate is range-pruned to the batch's id window.
  *
  * Usage: runMain graft.ProbeSpanStore [sfDir] [batchDocs] [replicate]
  */
object ProbeSpanStore {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchN = args.drop(1).headOption.map(_.toLong).getOrElse(500L)
    val replicate = args.drop(2).headOption.map(_.toInt).getOrElse(1)
    val spark = GraftSession.getOrCreate("graft-probe-spanstore")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val base = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // id-shifted copies (the ProbeAppend protocol): REAL duplicated text
    // across copies, so replicated stores carry genuinely hot spans —
    // the worst case for anything secretly scanning per-span history
    val baseShift = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val docs = (if (replicate <= 1) base
      else (0 until replicate).map(i =>
          base.select((col("doc_id") + lit(i * baseShift)).as("doc_id"),
            col("text")))
        .reduce(_.unionByName(_)))
      .localCheckpoint(true)
    val nDocs = docs.count()
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    // half the batch is fresh synthetic text, half duplicates corpus
    // docs under NEW ids — so the probe has real hits to report
    val fresh = spark.range(batchN / 2).select(
      (col("id") + maxId + 1L).as("doc_id"),
      concat(lit("fresh span probe document number "), col("id"),
        lit(" with shuffles partitions vectors windows and token "),
        pmod(xxhash64(col("id")), lit(997L))).as("text"))
    val dupes = base.orderBy("doc_id").limit((batchN / 2).toInt)
      .select((col("doc_id") + maxId + 1L + batchN).as("doc_id"), col("text"))
    val batch = fresh.unionByName(dupes).localCheckpoint(true)

    val dir = java.nio.file.Files.createTempDirectory("graft_probe_ss").toString
    // build as EIGHT drains, not one bulk load: a real store is the
    // residue of many appends, and the flat-partial count (8 ingests'
    // worth of per-shingle rows before compaction merges them) is
    // exactly what the drain-probe scan pays for
    time(s"build span store ($nDocs docs, 8 ingests)") {
      val chunk = (maxId + 1L) / 8L + 1L
      (0 until 8).foreach { i =>
        graft.operators.SpanStore.append(spark, s"$dir/store",
          docs.filter(col("doc_id") >= i * chunk &&
            col("doc_id") < (i + 1) * chunk),
          "text", "doc_id")
      }
    }
    val stats = time(s"probe ($batchN docs)") {
      val s = graft.operators.SpanStore.probe(spark, s"$dir/store", batch,
        "text", "doc_id")
      s.agg(count(lit(1)), sum(when(col("dup_tokens") > 0, 1L).otherwise(0L)))
        .head()
    }
    println(s"  probed rows: ${stats.getLong(0)}, with dup spans: ${
      stats.getLong(1)} (planted: ${batchN / 2})")
    val admitted = time(s"append ($batchN docs)") {
      graft.operators.SpanStore.append(spark, s"$dir/store", batch,
        "text", "doc_id")
    }
    println(s"  admitted: $admitted")
    // r13: the LSM faces. Compaction merges cross-ingest partials (the
    // row-count drop below is the real saving for drain-sized probes)
    // and lands the base BUCKETED; a document-sized probe then prunes
    // the base to its touched buckets by construction.
    def partialRows(): Long = {
      val commits = new java.io.File(s"$dir/store/_commits").listFiles()
        .map(_.getName).filterNot(n => n.startsWith(".") || n.startsWith("_"))
      spark.read.parquet(
        commits.map(k => s"$dir/store/span_docs/ingest=$k").toIndexedSeq: _*)
        .count()
    }
    val flatRows = partialRows()
    time(s"compact (${flatRows} partial rows)") {
      graft.operators.SpanStore.compact(spark, s"$dir/store")
    }
    val baseRows = partialRows()
    println(s"  partial rows: $flatRows flat -> $baseRows compacted")
    time(s"probe ($batchN docs, compacted base)") {
      graft.operators.SpanStore.probe(spark, s"$dir/store", batch,
          "text", "doc_id")
        .agg(count(lit(1))).head()
    }
    val pointBatch = base.orderBy("doc_id").limit(1)
      .select((col("doc_id") + maxId + 1L + 2L * batchN).as("doc_id"),
        col("text")).localCheckpoint(true)
    time("probe (1 doc, compacted base — touched-bucket prune)") {
      graft.operators.SpanStore.probe(spark, s"$dir/store", pointBatch,
          "text", "doc_id")
        .agg(count(lit(1))).head()
    }
    // r15: the INCREMENTAL fold (r14 verdict #1) — a further batch
    // lands a flat tail beside the bucketed base; its compact is
    // ADDITIVE (the aggregated tail becomes its own generation), so it
    // must cost ∝ tail alone, NOT ∝ corpus — even though this
    // drain-shaped tail touches every bucket, the shape where a
    // bucket-merging fold would still be a full base rewrite (the first
    // compact above pays the fold-everything price once)
    val tail = batch.select((col("doc_id") + 4L * batchN).as("doc_id"),
      col("text")).localCheckpoint(true)
    time(s"append ($batchN docs, post-compact tail)") {
      graft.operators.SpanStore.append(spark, s"$dir/store", tail,
        "text", "doc_id")
    }
    time(s"compact (INCREMENTAL: O(tail) fold, $batchN-doc tail beside $nDocs-doc base)") {
      graft.operators.SpanStore.compact(spark, s"$dir/store")
    }
    time(s"probe ($batchN docs, two generations)") {
      graft.operators.SpanStore.probe(spark, s"$dir/store", batch,
          "text", "doc_id")
        .agg(count(lit(1))).head()
    }
    // r15: the TIER fold at the generation cap — size-aware selection
    // must retire the SMALL batch-sized generation, not the corpus base,
    // so its cost is ∝ (tail + small generation), corpus-independent
    val tail2 = batch.select((col("doc_id") + 6L * batchN).as("doc_id"),
      col("text")).localCheckpoint(true)
    time(s"append ($batchN docs, pre-tier-fold tail)") {
      graft.operators.SpanStore.append(spark, s"$dir/store", tail2,
        "text", "doc_id")
    }
    time(s"compact (TIER FOLD at maxGens=2: small gen + tail, base kept)") {
      graft.operators.SpanStore.compact(spark, s"$dir/store", maxGens = 2)
    }
    time(s"probe ($batchN docs, post tier fold)") {
      graft.operators.SpanStore.probe(spark, s"$dir/store", batch,
          "text", "doc_id")
        .agg(count(lit(1))).head()
    }
    spark.stop()
  }
}
