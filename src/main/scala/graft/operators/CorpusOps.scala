package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus-assembly operators for training-data pipelines: deterministic
  * sampling, mixture weighting, and sequence packing. All are map-only or
  * block-parallel — no global coordination — and every decision derives
  * from a portable md5 hash of the row id, so a re-run, a different
  * partitioning, or a different engine (the DuckDB oracle) selects the
  * SAME rows. That reproducibility-under-reshuffle is the property that
  * matters when a 100 TB corpus is sampled incrementally.
  */
object CorpusOps {

  /** Uniform [0,1) decision value for a row: 24-bit md5 of (salt, id).
    * Portable: `('0x' || substr(md5('s:SALT:' || id), 1, 6))::BIGINT /
    * 16777216.0` computes the identical value in ANSI SQL.
    */
  def hashUniform(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(s"s:$salt:"), id.cast("string"))), 1, 6), 16, 10)
      .cast("long") / lit(16777216.0)

  /** Deterministic corpus sampling: keep a row iff its hash-uniform value
    * is below `rate`. Map-only; stable under re-partitioning and re-runs
    * (unlike `df.sample`, whose selection depends on partition layout).
    */
  def sampleByHash(df: DataFrame, idCol: String, rate: Double,
                   salt: String = "graft"): DataFrame =
    df.filter(hashUniform(col(idCol), salt) < rate)

  /** Weighted mixture selection: per-key acceptance rates (e.g. by source
    * or language), same deterministic decision value. Keys absent from
    * `weights` fall back to `defaultWeight`. The standard way to re-weight
    * corpus composition without materializing per-source splits.
    */
  def mixtureSelect(df: DataFrame, idCol: String, keyCol: String,
                    weights: Map[String, Double], defaultWeight: Double = 0.0,
                    salt: String = "mix"): DataFrame = {
    val rate = weights.foldLeft(lit(defaultWeight)) { case (acc, (k, w)) =>
      when(col(keyCol) === k, lit(w)).otherwise(acc)
    }
    df.filter(hashUniform(col(idCol), salt) < rate)
  }

  /** Sequential sequence-packing: documents are laid out in id order into
    * a token stream and cut into fixed `budget` windows — the standard
    * concat-and-split packing for LLM pre-training. Each document gets the
    * bin where it STARTS plus its offset in the stream.
    *
    * Scale shape: a single global stream would serialize on one window
    * partition, so the corpus is first split into `blocks` deterministic
    * hash-blocks (portable md5 of the id) and packed within each block in
    * parallel — 1000 executors pack 1000 blocks without coordination, and
    * bin ids are globally unique as (block, bin).
    */
  def packSequential(df: DataFrame, idCol: String, tokensCol: Column,
                     budget: Int, blocks: Int = 32): DataFrame = {
    val block = pmod(
      conv(substring(md5(concat(lit("b:"), col(idCol).cast("string"))), 1, 6), 16, 10)
        .cast("long"), lit(blocks.toLong))
    val w = Window.partitionBy(col("block")).orderBy(col(idCol))
    df.select(col(idCol), tokensCol.cast("long").as("n_tokens"), block.as("block"))
      .withColumn("stream_start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin_id", floor(col("stream_start") / budget))
      .withColumn("bin_offset", col("stream_start") % budget)
  }

  /** Token-length histogram: docs and token mass per power-of-two-ish
    * length bucket — the composition summary a data curator reads before
    * choosing packing budgets and length filters.
    */
  def lengthBuckets(df: DataFrame, idCol: String, tokensCol: Column,
                    bucketWidth: Int = 64, maxBucket: Int = 7): DataFrame =
    df.select(col(idCol), tokensCol.cast("long").as("n_tokens"))
      .withColumn("bucket", least(floor(col("n_tokens") / bucketWidth), lit(maxBucket)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
}
