package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame}

/** DSIR-style data selection — importance resampling over hashed n-gram
  * features (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): estimate bag-of-hashed-bigram distributions
  * for a TARGET corpus (what you want more of) and the RAW corpus (what
  * you have), weight every raw document by its log likelihood ratio, and
  * resample via Gumbel top-k — documents that look like the target are
  * exponentially more likely to be drawn, but the tail is never hard-cut
  * the way a threshold filter would.
  *
  * Scale shape:
  *
  *  - FEATURIZE: hashed bigrams (portable 24-bit md5 → `buckets`) are a
  *    map-only explode; the per-bucket count tables aggregate partial →
  *    final to ≤ `buckets` rows each — bounded by construction, whatever
  *    the corpus size.
  *  - WEIGHT: the log-likelihood-ratio table (buckets rows) broadcasts;
  *    per-doc log-weights are one hash-aggregate over the bigram stream
  *    (sum of llr with multiplicity). Nothing corpus-sized shuffles —
  *    the exchange carries one row per doc.
  *  - RESAMPLE: Gumbel keys from the portable hash make the draw
  *    deterministic and partition-invariant; top-k plans as
  *    TakeOrderedAndProject (bounded heaps, ≤ k rows per task).
  *
  * Determinism & oracle parity: bucket ids are the md5 scheme shared
  * with [[CorpusOps.hashUniform]]; per-doc sums funnel through
  * DECIMAL(38,12) (partition-order-invariant, the lm_perplexity
  * pattern); Gumbel noise derives from the md5 uniform, so the selected
  * set is reproducible by the SQL oracle verbatim.
  */
object Dsir {

  /** (doc, bucket, n occurrences) for every hashed bigram of `textCol`.
    * Tokens are the whitespace scheme shared with [[TextAnalysis]]
    * (lowercase, split on space, empties dropped); docs with < 2 tokens
    * contribute no rows.
    */
  def bigramBuckets(df: DataFrame, idCol: String, textCol: String,
                    buckets: Int): DataFrame = {
    val toks = filter(TextAnalysis.tokens(col(textCol)), t => length(t) > 0)
    graft.Tables.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol), toks.as("w"))
      .select(col(idCol),
        explode(when(size(col("w")) < 2,
            array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), size(col("w")) - 2),
            i => concat(element_at(col("w"), i + 1), lit(" "),
                        element_at(col("w"), i + 2))))).as("bg"))
      .select(col(idCol),
        pmod(conv(substring(md5(concat(lit("d:"), col("bg"))), 1, 6), 16, 10)
          .cast("long"), lit(buckets.toLong)).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Laplace-smoothed per-bucket log likelihood ratio table from
    * FEATURIZED sides ([[bigramBuckets]] output): llr(b) =
    * ln((target_b + 1) / (targetN + buckets))
    * − ln((raw_b + 1) / (rawN + buckets)).
    * ≤ `buckets` rows — the bounded, persistable "trained importance
    * model" (at real scale: train once on samples, reuse every batch).
    * Takes pre-featurized inputs so callers can share one bigram pass
    * across the totals, the scalar collects, and the weight join.
    * Empty sides degrade to zero totals (all-smoothing ratios), not a
    * crash.
    */
  def logRatioTable(rawBuckets: DataFrame, targetBuckets: DataFrame,
                    buckets: Int): DataFrame = {
    def total(df: DataFrame): Long = { // bounded: 1 scalar; null when empty
      val r = df.agg(sum("c")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val rawC = rawBuckets.groupBy("bucket").agg(sum("n").as("c"))
    val tgtC = targetBuckets.groupBy("bucket").agg(sum("n").as("c"))
    val rawN = total(rawC)
    val tgtN = total(tgtC)
    rawC.withColumnRenamed("c", "raw_c")
      .join(tgtC.withColumnRenamed("c", "tgt_c"), Seq("bucket"), "full")
      .na.fill(0L, Seq("raw_c", "tgt_c"))
      .select(col("bucket"),
        (log((col("tgt_c") + 1.0) / lit(tgtN + buckets.toDouble)) -
         log((col("raw_c") + 1.0) / lit(rawN + buckets.toDouble)))
          .as("llr"))
  }

  /** Per-doc log importance weight from a featurized corpus: Σ
    * llr(bucket) · multiplicity, decimal funnel. Docs with no bigrams
    * get no row here — [[select]] fills weight 0 for them (kept,
    * weightless — the declared semantics).
    */
  def logWeights(rawBuckets: DataFrame, llr: DataFrame, idCol: String): DataFrame =
    rawBuckets
      .join(broadcast(llr), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum((col("llr") * col("n")).cast(DecimalType(38, 12)))
        .cast("double").as("log_weight"))

  /** Gumbel-top-k importance resample of `raw` toward `target`: returns
    * the k drawn docs with their (rounded) log-weights. `temperature`
    * scales the exploitation/exploration trade-off (1.0 = faithful DSIR;
    * → 0 approaches deterministic top-k by weight).
    */
  def select(raw: DataFrame, target: DataFrame, idCol: String,
             textCol: String, buckets: Int, k: Int,
             salt: String = "dsir", temperature: Double = 1.0): DataFrame = {
    // ONE featurize pass per side, eagerly checkpointed: the bucket
    // totals, the grand-total scalar jobs, and the per-doc weight sums
    // all read it — without the materialization the bigram explode runs
    // three times. localCheckpoint (not persist) so the blocks are
    // reclaimed by the ContextCleaner once the result is dropped — a
    // bench/driver loop re-invoking select() must not accumulate caches
    // (the Bpe.train lineage discipline).
    val db = bigramBuckets(raw, idCol, textCol, buckets).localCheckpoint(true)
    val tgtB = bigramBuckets(target, idCol, textCol, buckets).localCheckpoint(true)
    val llr = logRatioTable(db, tgtB, buckets)
    val lw = logWeights(db, llr, idCol)
    val u = CorpusOps.hashUniform(col(idCol), salt)
    // guard: u ∈ {0} hash cells would make -ln(-ln(u)) infinite; the
    // 24-bit grid never yields exactly 1.0, and 0 maps to the smallest
    // positive cell midpoint
    val u2 = greatest(u, lit(1.0 / 33554432.0))
    val key = col("log_weight") / lit(temperature) - log(-log(u2))
    val drawn = raw.select(col(idCol))
      .join(lw, Seq(idCol), "left")
      .na.fill(0.0, Seq("log_weight"))
      .withColumn("gumbel_key", key)
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k) // TakeOrderedAndProject — bounded heaps, no global sort
    drawn.select(col(idCol), round(col("log_weight"), 6).as("log_weight"))
  }
}
