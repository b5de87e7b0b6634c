package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The whole-directory crash protocol every persisted graft store shares
  * — ONE implementation (the r10 code-review consolidation: five heal
  * copies and four swap copies had to stay byte-for-byte consistent by
  * hand before this).
  *
  * [[swapInto]] replaces a live directory with a fully-written temp in
  * two renames: stage the live directory aside as `<path>__old`, move
  * the temp in, roll back if the second rename fails — a reader sees the
  * old or the new contents, never a mix, but there is a brief window
  * where the path is ABSENT, and a crash inside it parks the store at
  * `__old`. [[heal]] repairs exactly that state (path missing, `__old`
  * present → rename back; the `__old` contents are the complete
  * pre-swap store by construction) and must run before any read of a
  * swap-managed directory. Single-writer: heal's existence check races
  * a concurrent swap — the writers that tolerate the race document it
  * (Warehouse.recoverStranded keeps its own variant for that reason:
  * its overwrite retries until the writer wins).
  */
private[graft] object StoreProtocol {

  /** Repair a [[swapInto]] crashed between its two renames. */
  def heal(fs: FileSystem, path: Path): Unit = {
    val old = new Path(path.toString + "__old")
    if (!fs.exists(path) && fs.exists(old)) fs.rename(old, path)
    ()
  }

  /** The committed ingest keys of a marker-protocol store (`_commits/`
    * entries under `root`) — shared by the incremental BM25 index and
    * the span store (one implementation, the heal/swap consolidation
    * argument applied to the marker read).
    */
  def committedKeys(fs: FileSystem, root: Path): Seq[String] = {
    val commitsDir = new Path(root, "_commits")
    if (!fs.exists(commitsDir)) Nil
    else fs.listStatus(commitsDir).toSeq.map(_.getPath.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_"))
  }

  /** The pinned bloom fpp of a store's meta frame — the `bloom_fpp`
    * column when present, else the historical 1e-4 default (pre-pinning
    * stores). ONE implementation: the serving stack, the incremental
    * BM25 index and the gate-info audit readers all pin at the same
    * rate, so a default drift cannot skew one of them (r13 review
    * catch: three hand-kept copies).
    */
  def pinnedFpp(meta: DataFrame): Double =
    if (meta.schema.fieldNames.contains("bloom_fpp"))
      meta.head().getDouble(meta.schema.fieldIndex("bloom_fpp"))
    else 1e-4

  // ----------------------------------------------------- LSM bucket pair
  //
  // The hash-keyed stores (SpanStore's span_docs, GraphStore's labels)
  // share one layout law: appends write FLAT per-batch partials (cheap,
  // no small-files tax), consolidation lands the base PARTITIONED by
  // `bucket = key mod <store's bucket count>` so point reads prune it
  // by construction (row-group stats can never prune uniform hashes),
  // and layouts are self-describing per ingest. ONE implementation —
  // the heal/swap consolidation argument applied to the bucket
  // machinery (r13 review catch: two hand-kept copies had already
  // appeared).
  //
  // The bucket count is PER STORE, recorded in its meta frame
  // (`lsm_buckets` column) at the first ingest and re-recorded by every
  // consolidation — r13's fixed 256 saturated on drain-sized batches (a
  // batch with ≥ 256 distinct keys touched every bucket and re-read the
  // whole base per append: ProbeGraphStore's 2.6 → 3.9 s drift), and a
  // hard-coded constant cannot be raised without silently breaking the
  // prune on every store compacted under the old modulus. Readers pin
  // the recorded count ([[pinnedLsmBuckets]] — absent column = the
  // historical 256 layout), consolidation migrates the layout to a new
  // count atomically with the meta (same directory swap), and a base
  // whose bucket dirs exceed the pinned count refuses loudly
  // ([[readLsm]]'s guard) instead of returning silently-pruned-wrong
  // rows.

  /** The historical bucket count — pinned for stores whose meta predates
    * the `lsm_buckets` column (their on-disk base IS mod-256).
    */
  val DefaultLsmBuckets = 256

  /** Default for NEW stores: at 4096 a drain-sized batch (~10³ distinct
    * keys) still prunes the base to ~¼ instead of saturating, and a
    * point probe (~10² keys) reads ~2% of it. The dir-count tax is one
    * directory listing per read ([[splitLsmLayout]] already pays it).
    */
  val WideLsmBuckets = 4096

  /** The pinned bucket count of a store's meta frame — `lsm_buckets`
    * when present, else the historical 256 (pre-parameterization
    * stores, whose compacted base is mod-256 on disk). ONE
    * implementation, the pinnedFpp argument: every reader of one store
    * must pin the same modulus or the prune silently drops rows.
    */
  def pinnedLsmBuckets(meta: DataFrame): Int =
    if (meta.schema.fieldNames.contains("lsm_buckets")) {
      val row = meta.head()
      row.getInt(row.fieldIndex("lsm_buckets"))
    } else DefaultLsmBuckets

  /** Split committed ingests of `tableDir` (e.g. `<dir>/span_docs`) by
    * on-disk layout — (bucketed base, flat tail). Self-describing: one
    * directory listing per ingest, no meta versioning to drift.
    */
  def splitLsmLayout(fs: FileSystem, tableDir: String,
                     committed: Seq[String]): (Seq[String], Seq[String]) =
    committed.partition { k =>
      val d = new Path(s"$tableDir/ingest=$k")
      fs.exists(d) && fs.listStatus(d).exists(s =>
        s.isDirectory && s.getPath.getName.startsWith("bucket="))
    }

  /** The committed rows of an LSM table, with the bucketed base pruned
    * to `touched` buckets (None = read everything — consolidation).
    * Flat and bucketed ingests read separately (one multi-path read
    * would refuse the mixed partition structure), then union by name
    * over `columns` (the partition column drops out). `buckets` is the
    * store's PINNED count ([[pinnedLsmBuckets]]); a pruned read first
    * verifies every on-disk bucket dir sits under it — a base laid out
    * under a DIFFERENT modulus (a hand-copied store, a meta edited out
    * of band) would otherwise return silently incomplete rows, the one
    * failure mode worse than a full scan. Unpruned reads skip the check
    * (every row is read regardless of modulus).
    */
  def readLsm(spark: SparkSession, fs: FileSystem, tableDir: String,
              committed: Seq[String], columns: Seq[String],
              touched: Option[Seq[Int]],
              buckets: Int = DefaultLsmBuckets): DataFrame = {
    val (bucketed, flat) = splitLsmLayout(fs, tableDir, committed)
    if (touched.isDefined) bucketed.foreach { k =>
      val dirs = fs.listStatus(new Path(s"$tableDir/ingest=$k"))
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
        .map(_.getPath.getName.stripPrefix("bucket=").toInt)
      require(dirs.forall(_ < buckets),
        s"readLsm: $tableDir/ingest=$k holds bucket dirs up to " +
          s"${dirs.max} but the store pins lsm_buckets=$buckets — the " +
          "base was laid out under a different modulus; a pruned read " +
          "would silently drop rows. Re-compact the store (or fix the " +
          "meta) before probing it.")
    }
    val cols = columns.map(col)
    val reads = Seq(
      if (flat.isEmpty) None
      else Some(spark.read
        .parquet(flat.map(c => s"$tableDir/ingest=$c"): _*)
        .select(cols: _*)),
      if (bucketed.isEmpty) None
      else {
        val base = spark.read
          .parquet(bucketed.map(c => s"$tableDir/ingest=$c"): _*)
        Some(touched.fold(base)(t =>
            base.filter(col("bucket").isin(t: _*)))
          .select(cols: _*))
      }).flatten
    reads.reduce(_.unionByName(_))
  }

  /** The ≤ `buckets` buckets `df`'s `keyCol` values touch — the bounded
    * collect that becomes the base read's partition filter.
    */
  def touchedLsmBuckets(df: DataFrame, keyCol: String,
                        buckets: Int = DefaultLsmBuckets): Seq[Int] =
    df.select(pmod(col(keyCol), lit(buckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq

  /** Write `df` as a consolidated BUCKETED base at `path` — hash-
    * repartitioned BY the bucket column first so each bucket's rows land
    * in one task (one file per bucket dir; without it every task writes
    * files into every bucket dir — a `buckets`× small-files tax). Task
    * count follows `spark.sql.shuffle.partitions`, so write parallelism
    * scales with the session, not the modulus.
    */
  def writeLsmBase(df: DataFrame, keyCol: String, path: String,
                   buckets: Int = DefaultLsmBuckets): Unit =
    df.withColumn("bucket",
        pmod(col(keyCol), lit(buckets.toLong)).cast("int"))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)

  /** Replace `path` with the fully-written `tmp` through the `__old`
    * two-rename swap; `op` names the caller in failure messages.
    */
  def swapInto(fs: FileSystem, tmp: Path, path: Path, op: String): Unit = {
    val old = new Path(path.toString + "__old")
    fs.delete(old, true)
    if (!fs.rename(path, old))
      throw new IllegalStateException(s"$op: cannot stage $path")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // roll back — the store stays readable
      throw new IllegalStateException(s"$op: swap failed for $path")
    }
    fs.delete(old, true)
    ()
  }
}
