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
              broadcastBench: Boolean = true): DataFrame = {
    def sh(d: DataFrame) =
      if (portable) Dedup.shingleHashesPortable(d, textCol, idCol, k)
      else Dedup.shingleHashes(d, textCol, idCol, k)
    val b = sh(bench).select(col(idCol).as("bench_id"), col("shingle"))
    sh(corpus).join(if (broadcastBench) broadcast(b) else b, Seq("shingle"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("shingle")).as("n_shared_shingles"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .filter(col("n_shared_shingles") >= minShared)
  }
}
