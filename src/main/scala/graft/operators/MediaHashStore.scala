package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted perceptual-hash store for streaming media dedup — the index
  * behind [[graft.streaming.IncrementalStream.mediaDedupIngest]].
  *
  * The naive layout (one row per hashed unit, scanned whole per screen)
  * reads the ENTIRE store on every micro-batch — at 10B media items
  * that is a corpus-sized scan per batch, the classic shape that works
  * in a fixture and melts at 100 TB. This store is laid out for
  * point-ish lookups instead:
  *
  *   - rows are EXPLODED one-per-pigeonhole-block (`blocks` = Hamming
  *     bound + 1 — [[Dedup.blockMask]] is the shared geometry), each
  *     carrying its `block_key` and a `band_bucket` partition column =
  *     blk·256 + (block value mod 256);
  *   - `hashes/` is parquet PARTITIONED BY `band_bucket` (≤ blocks·256
  *     directories), so a screen prunes the scan to only the buckets
  *     the batch's own keys hash into — per-batch read cost tracks the
  *     BATCH (≤ blocks·|units| buckets, each ~1/(blocks·256) of the
  *     store), not the store's age. Rows are thin (ids + 72 ints + a
  *     long — payloads never enter the store), so the blocks-× row
  *     explosion is the usual posting-list trade;
  *   - the banding geometry is FROZEN at first append in `meta`
  *     (written LAST — its presence commits the store, the
  *     TokenizerArtifact discipline) and re-validated on every later
  *     append/screen: a store banded for Hamming ≤ 3 cannot silently
  *     serve a Hamming ≤ 5 screen, whose pairs could agree only on
  *     blocks this layout never indexed.
  *
  * [[compact]] bounds the append-per-batch small-file growth (one file
  * per touched bucket per batch) by rewriting each bucket to one file
  * through the directory temp-then-swap used everywhere else
  * (`__old` crash healing in [[read]]).
  */
object MediaHashStore {

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def healed(spark: SparkSession, dir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/hashes")
    val fs = fsOf(spark, path)
    val old = new org.apache.hadoop.fs.Path(s"$dir/hashes__old")
    if (!fs.exists(path) && fs.exists(old)) fs.rename(old, path)
  }

  /** Does `dir` hold a committed store? (meta marker present) */
  def exists(spark: SparkSession, dir: String): Boolean =
    fsOf(spark, new org.apache.hadoop.fs.Path(s"$dir/meta"))
      .exists(new org.apache.hadoop.fs.Path(s"$dir/meta"))

  private def requireGeometry(spark: SparkSession, dir: String,
                              blocks: Int): Unit = {
    val m = spark.read.parquet(s"$dir/meta").head()
    require(m.getInt(0) == blocks,
      s"MediaHashStore at $dir was banded with blocks=${m.getInt(0)}; " +
        s"this operation assumes blocks=$blocks (maxHamming=${blocks - 1}) — " +
        "rebanding requires a rebuild, not a silent mismatch")
  }

  /** One exploded row per (unit, block): the unit's columns plus its
    * `block_key` and `band_bucket`. `hashes` rows: (idCol, grid, dhash)
    * plus any carry-through columns.
    */
  private def withBands(hashes: DataFrame, blocks: Int): DataFrame = {
    val bands = array((0 until blocks).map { blk =>
      val (lo, mask) = Dedup.blockMask(blk, blocks)
      val v = shiftrightunsigned(col("dhash"), lo).bitwiseAND(mask)
      struct(concat_ws(":", lit(blk), v).as("block_key"),
        (lit(blk) * 256 + pmod(v, lit(256L))).cast("int").as("band_bucket"))
    }: _*)
    hashes.withColumn("__b", explode(bands))
      .withColumn("block_key", col("__b.block_key"))
      .withColumn("band_bucket", col("__b.band_bucket"))
      .drop("__b")
  }

  /** Append a batch of unit hashes (columns: ids…, grid, dhash; null
    * hashes must already be filtered). First append commits the store
    * by writing `meta` LAST.
    */
  def append(spark: SparkSession, dir: String, hashes: DataFrame,
             maxHamming: Int = 3): Unit = {
    import spark.implicits._
    val blocks = maxHamming + 1
    healed(spark, dir)
    if (exists(spark, dir)) requireGeometry(spark, dir, blocks)
    withBands(hashes, blocks)
      .write.mode("append").partitionBy("band_bucket")
      .parquet(s"$dir/hashes")
    if (!exists(spark, dir))
      Seq(blocks).toDF("blocks")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Read the store's unit rows (de-banded: one row per unit). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    healed(spark, dir)
    spark.read.parquet(s"$dir/hashes")
      .drop("block_key", "band_bucket").distinct()
  }

  /** Screen a batch of unit hashes against the committed store: returns
    * (id_a = batch unit id, id_b = store unit id, hamming, grid_l1) for
    * every batch unit within the store's frozen Hamming bound AND
    * `maxL1` of a committed one. The batch side is micro-batch-sized
    * and BROADCAST; the store scan is PRUNED to the batch's own band
    * buckets (partition pruning on the literal bucket list — bounded by
    * blocks·|batch units|, collected from the cached batch). Full
    * recall at the bound (pigeonhole), so the screen doubles as the
    * re-delivery guard.
    */
  def screenUnits(spark: SparkSession, dir: String, batch: DataFrame,
                  idCol: String, maxHamming: Int = 3,
                  maxL1: Double = 12750.0): DataFrame = {
    val blocks = maxHamming + 1
    healed(spark, dir)
    requireGeometry(spark, dir, blocks)
    val b = withBands(
        batch.filter(col("dhash").isNotNull)
          .select(col(idCol), col("grid"), col("dhash")), blocks)
      .select(col(idCol).as("id_a"), col("grid").as("grid_a"),
        col("dhash").as("sig_a"), col("block_key"), col("band_bucket"))
    // bounded collect: <= blocks x |batch units| distinct buckets
    val buckets = b.select("band_bucket").distinct()
      .collect().map(_.getInt(0))
    if (buckets.isEmpty)
      return spark.emptyDataFrame
        .withColumn("id_a", lit(0L)).withColumn("id_b", lit(0L))
        .withColumn("hamming", lit(0L)).withColumn("grid_l1", lit(0.0))
        .limit(0)
    val store = spark.read.parquet(s"$dir/hashes")
      .filter(col("band_bucket").isin(buckets.map(Integer.valueOf).toIndexedSeq: _*))
      .select(col(idCol).as("id_b"), col("grid").as("grid_b"),
        col("dhash").as("sig_b"), col("block_key"))
    val cand = store
      .join(broadcast(b.select(col("id_a"), col("grid_a"), col("sig_a"),
        col("block_key"))), Seq("block_key"))
      .drop("block_key").distinct()
    Dedup.dhashVerify(cand, maxHamming, maxL1)
  }

  /** Rewrite every band bucket to one file (repeated appends leave one
    * file per touched bucket per batch) through the standard
    * temp-then-swap; row contents and partition layout preserved.
    * Returns (files before, files after). SINGLE-WRITER: run between
    * AvailableNow drains (mediaDedupIngest's `compactEvery` does).
    */
  def compact(spark: SparkSession, dir: String): (Int, Int) = {
    healed(spark, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(s"$dir/hashes")
    val fs = path.getFileSystem(conf)
    def countFiles(p: org.apache.hadoop.fs.Path): Int = {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val before = countFiles(path)
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/hashes__compact")
    val old = new org.apache.hadoop.fs.Path(s"$dir/hashes__old")
    fs.delete(tmp, true)
    val df = spark.read.parquet(path.toString)
    df.repartition(col("band_bucket"))
      .write.mode("overwrite").partitionBy("band_bucket")
      .parquet(tmp.toString)
    fs.delete(old, true)
    if (!fs.rename(path, old))
      throw new IllegalStateException(s"MediaHashStore.compact: cannot stage $path")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // roll back — the store stays readable
      throw new IllegalStateException(s"MediaHashStore.compact: swap failed for $path")
    }
    fs.delete(old, true)
    (before, countFiles(path))
  }
}
