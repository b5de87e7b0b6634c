package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find corpus documents that share k-gram
  * shingles with an evaluation/benchmark set, so they can be dropped
  * before training (test-set leakage removal).
  *
  * Scale shape: the benchmark side is BROADCAST — eval sets are a few
  * thousand documents against a 100 TB corpus, so the corpus-side shingle
  * stream is never shuffled for the join; it probes a broadcast hash map
  * and only the matching (tiny) subset reaches the per-doc aggregation.
  * Shingles are 8-byte hashes (xxhash64 by default, md5-poly when
  * `portable` — same contract as the Dedup operators).
  */
object Decontam {

  /** Corpus docs sharing at least `minShared` distinct k-token shingles
    * with any benchmark doc. Returns (idCol, n_shared_shingles,
    * n_bench_docs) — the contaminated-doc report; anti-join the corpus
    * against it to scrub.
    *
    * Set `broadcastBench = false` when the eval side's shingle set won't
    * fit in executor memory (e.g. decontaminating one corpus against
    * another): the join becomes a plain hash-shuffle on the shingle key —
    * both sides shuffle once, still no range/cartesian behavior.
    */
  def overlap(corpus: DataFrame, bench: DataFrame, textCol: String,
              idCol: String, k: Int = 8, minShared: Long = 1,
              portable: Boolean = false,
              broadcastBench: Boolean = true,
              corpusShingles: Option[DataFrame] = None): DataFrame = {
    def sh(d: DataFrame) =
      if (portable) Dedup.shingleHashesPortable(d, textCol, idCol, k)
      else Dedup.shingleHashes(d, textCol, idCol, k)
    // `corpusShingles`: a caller that already exploded the same
    // (corpus, k) — the shingle explode is the corpus-scale cost here,
    // and a pipeline using the stream twice (decontamination + the
    // source-rank projection — r14 verdict #3) should pay it once. Must
    // carry (idCol, shingle) under the SAME hash family as `portable`;
    // extra columns are dropped, duplicate rows are harmless (the
    // aggregate counts distinct)
    val c = corpusShingles.map(_.select(col(idCol), col("shingle")))
      .getOrElse(sh(corpus))
    val b = sh(bench).select(col(idCol).as("bench_id"), col("shingle"))
    c.join(if (broadcastBench) broadcast(b) else b, Seq("shingle"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("shingle")).as("n_shared_shingles"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .filter(col("n_shared_shingles") >= minShared)
  }

  /** Per-document contamination REPORT: every corpus doc with its total
    * distinct shingle count, the count shared with the benchmark, and the
    * shared fraction (the "n-gram contamination rate" a curation run
    * thresholds on — [[overlap]] answers "which docs touch the bench at
    * all", this answers "how much"). Same broadcast-bench scale shape:
    * the corpus stream probes a broadcast distinct-shingle set, nothing
    * corpus-sized shuffles before the per-doc aggregate.
    */
  def contaminationScore(corpus: DataFrame, bench: DataFrame, textCol: String,
                         idCol: String, k: Int = 8, portable: Boolean = false,
                         broadcastBench: Boolean = true): DataFrame = {
    def sh(d: DataFrame) =
      if (portable) Dedup.shingleHashesPortable(d, textCol, idCol, k)
      else Dedup.shingleHashes(d, textCol, idCol, k)
    val b = sh(bench).select(col("shingle")).distinct().withColumn("__hit", lit(1L))
    sh(corpus).join(if (broadcastBench) broadcast(b) else b, Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_shared"))
      .select(col(idCol), col("n_shingles"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_shingles"), 6)
          .as("contamination"))
  }

  /** Persist the benchmark's decontamination artifact under `dir`: the
    * shingle table (`bench_id`, `shingle`) as parquet and the distinct-
    * shingle bloom filter as one binary blob. Eval benchmarks change
    * rarely while corpora churn constantly — re-shingling (and worse,
    * re-building the bloom) per curation run pays the bench-side cost on
    * every invocation; the persisted artifact pays it ONCE and every run
    * opens with a bounded read (bloom bytes ≈ 10 bits × |bench shingles|)
    * plus the parquet verification table. All I/O goes through the Hadoop
    * filesystem of `dir` — object stores work, not just local paths.
    */
  def buildBenchArtifact(bench: DataFrame, textCol: String, idCol: String,
                         dir: String, k: Int = 8, portable: Boolean = false,
                         fpp: Double = 0.01): Unit = {
    val spark = bench.sparkSession
    val b = (if (portable) Dedup.shingleHashesPortable(bench, textCol, idCol, k)
             else Dedup.shingleHashes(bench, textCol, idCol, k))
      .select(col(idCol).as("bench_id"), col("shingle"))
      .localCheckpoint(true) // feeds the write AND the bloom build once
    b.write.mode("overwrite").parquet(s"$dir/shingles")
    val distinctSh = b.select("shingle").distinct()
    val nDistinct = math.max(distinctSh.count(), 1L)
    val bloom = distinctSh.stat.bloomFilter("shingle", nDistinct, fpp)
    val path = new org.apache.hadoop.fs.Path(s"$dir/bloom.bin")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try bloom.writeTo(out) finally out.close()
  }

  /** [[overlap]] answered FROM a persisted [[buildBenchArtifact]]: the
    * corpus stream is prefiltered map-only by the reloaded bloom, and
    * survivors verify against the persisted shingle table — results are
    * IDENTICAL to [[overlap]]/[[overlapBloom]] at the same parameters
    * (false positives never reach the output), so the persisted query
    * shares their oracle verbatim. The per-run bench cost drops from
    * shingling + bloom construction to one bounded artifact read.
    */
  def overlapPersisted(corpus: DataFrame, artifactDir: String, textCol: String,
                       idCol: String, k: Int = 8, minShared: Long = 1,
                       portable: Boolean = false,
                       broadcastBench: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    val path = new org.apache.hadoop.fs.Path(s"$artifactDir/bloom.bin")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    val bloom =
      try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
      finally in.close()
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val b = spark.read.parquet(s"$artifactDir/shingles")
    val sh = if (portable) Dedup.shingleHashesPortable(corpus, textCol, idCol, k)
             else Dedup.shingleHashes(corpus, textCol, idCol, k)
    val pre = sh.filter(
      graft.functions.might_contain_long(lit(bytes), col("shingle")))
    pre.join(if (broadcastBench) broadcast(b) else b, Seq("shingle"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("shingle")).as("n_shared_shingles"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .filter(col("n_shared_shingles") >= minShared)
  }

  /** [[overlap]] with a bloom-filter prefilter on the corpus side — the
    * shuffle-join scale path. With `broadcastBench = false` (two corpora,
    * eval side too big to broadcast) the plain join shuffles EVERY corpus
    * shingle; here the bench side's distinct shingle hashes are folded
    * into one bloom filter (driver-side, bounded: bits ≈ 10×|bench
    * shingles| at fpp 1%), and a map-only, codegen'd `might_contain`
    * eliminates the ~non-matching shingle stream before any exchange.
    * Shuffle volume drops from |corpus shingles| to |true matches| +
    * fpp×|corpus shingles|.
    *
    * The bloom is a prefilter, never the verdict: survivors still pass
    * through the exact join, so false positives cannot reach the output —
    * results are IDENTICAL to [[overlap]] (same oracle), only the plan
    * differs.
    */
  def overlapBloom(corpus: DataFrame, bench: DataFrame, textCol: String,
                   idCol: String, k: Int = 8, minShared: Long = 1,
                   portable: Boolean = false, fpp: Double = 0.01,
                   broadcastBench: Boolean = true): DataFrame = {
    def sh(d: DataFrame) =
      if (portable) Dedup.shingleHashesPortable(d, textCol, idCol, k)
      else Dedup.shingleHashes(d, textCol, idCol, k)
    // bench shingles feed the bloom build (distinct + count) AND the lazy
    // verification join — eager localCheckpoint, not cache, so the blocks
    // die with the result instead of accumulating across invocations
    val b = sh(bench).select(col(idCol).as("bench_id"), col("shingle"))
      .localCheckpoint(true)
    val distinctSh = b.select("shingle").distinct()
    val nDistinct = math.max(distinctSh.count(), 1L)
    val bloom = distinctSh.stat.bloomFilter("shingle", nDistinct, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val pre = sh(corpus).filter(
      graft.functions.might_contain_long(lit(bytes), col("shingle")))
    pre.join(if (broadcastBench) broadcast(b) else b, Seq("shingle"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("shingle")).as("n_shared_shingles"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .filter(col("n_shared_shingles") >= minShared)
  }
}
