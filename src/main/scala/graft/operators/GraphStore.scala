package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted connected-components store — the INCREMENTAL face of
  * [[Graph.connectedComponents]], for the continuous-ingestion shape
  * where re-running CC over every edge ever seen per batch is a
  * non-starter: an entity-resolution feed asks "which component does
  * this node belong to NOW?" against an artifact that grows in O(batch)
  * per drain.
  *
  * The monotonicity that makes this possible: new edges only MERGE
  * components, never split them. So the store never rewrites labels in
  * place — it appends batch-sized facts and RESOLVES at read time:
  *
  *   meta                     (node_col) — frozen at the first ingest
  *   labels/ingest=<key>/     (node, comp) — each node's label AT ITS
  *                            INSERT ingest; ingests partition the node
  *                            space (a node's row is written once, by
  *                            the ingest that first saw it). Flat from
  *                            appends; compact lands the consolidated
  *                            base BUCKETED (bucket = node mod the
  *                            store's pinned count — meta `lsm_buckets`,
  *                            4096 for new stores, 256 pre-pinning) so
  *                            point lookups prune it (the SpanStore LSM
  *                            pair).
  *   remap/ingest=<key>/      (old_comp, new_comp) — the merges this
  *                            ingest caused, FULLY RESOLVED at append
  *                            time (old_comp is a root as of the
  *                            previous ingest), so resolution applies
  *                            each remap table at most once and chain
  *                            depth ≤ #uncompacted ingests.
  *   edges/ingest=<key>/      the batch's distinct edges — NOT read by
  *                            append or lookup; kept solely so [[forget]]
  *                            can recompute exactly (see below) and
  *                            [[compact]] could rebuild from scratch.
  *   _commits/<key>           commit marker, written LAST
  *
  * Scale shape: [[append]] reads committed labels only for the batch's
  * touched nodes (broadcast semi-join — map-only over the label
  * footprint, bucket-pruned once compacted), contracts the batch edges
  * by those labels, runs CC on the CONTRACTED graph (batch-sized —
  * [[Dedup.clusterReps]], driver fast path under its measured cap), and
  * writes three batch-sized partials. Nothing store-sized rewrites.
  * [[labels]] resolves the remap chain by iterated joins — each remap
  * table is merge-sized (broadcast), depth bounded by the uncompacted
  * ingest count, zero after a compact. [[forget]] of an edge SPLITS
  * components — fundamentally not incremental (deleting an edge can
  * disconnect anything downstream), so it recomputes CC over the
  * surviving stored edges and consolidates: exact, priced as a rebuild,
  * and said so here rather than hidden (the SpanStore non-invertibility
  * honesty note, graph edition).
  *
  * Replay idempotency is VALUE-level, not log-level: a re-delivered
  * batch's endpoints are already labeled, its contracted edges connect
  * already-merged roots, and the merge set comes back empty — labels
  * and every query answer are untouched. The batch's edges still
  * commit (an edges-only ingest): the store cannot distinguish a
  * replay from a new-but-redundant edge without reading the whole log,
  * and dropping either would hole the edge log [[forget]]'s exactness
  * depends on. Duplicates collapse under the consolidation distinct;
  * compact folds the extra ingests.
  *
  * Single-writer, like every graft maintenance operator (lease at the
  * streaming layer; [[compact]]/[[forget]] are lease-guarded directly).
  */
object GraphStore {

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def committedKeys(fs: org.apache.hadoop.fs.FileSystem,
                            root: org.apache.hadoop.fs.Path): Seq[String] =
    StoreProtocol.committedKeys(fs, root)

  private def metaOf(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/meta")

  private def readMeta(spark: SparkSession, dir: String): String =
    metaOf(spark, dir).select("node_col").head().getString(0)

  private def bucketsOf(spark: SparkSession, dir: String): Int =
    StoreProtocol.pinnedLsmBuckets(metaOf(spark, dir))

  /** Committed (node, comp) label rows — the shared LSM pair
    * ([[StoreProtocol.readLsm]]); when `touched` is given, the bucketed
    * base prunes to those nodes' buckets under the store's PINNED
    * modulus (meta `lsm_buckets`; 256 for pre-pinning layouts).
    */
  private def readLabels(spark: SparkSession, dir: String,
                         fs: org.apache.hadoop.fs.FileSystem,
                         committed: Seq[String],
                         touched: Option[DataFrame],
                         buckets: Int): DataFrame =
    StoreProtocol.readLsm(spark, fs, s"$dir/labels", committed,
      Seq("node", "comp"),
      touched.map(t => StoreProtocol.touchedLsmBuckets(t, "node", buckets)),
      buckets)

  /** The committed remap chain, oldest ingest first (ingest keys carry
    * their generation prefix `i<n>_`/`r<n>_`, so lexicographic-by-
    * generation order is append order).
    */
  private def remapTables(spark: SparkSession, dir: String,
                          fs: org.apache.hadoop.fs.FileSystem,
                          committed: Seq[String]): Seq[DataFrame] =
    committed.sortBy(genOf).flatMap { k =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/remap/ingest=$k")
      if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
    }

  private def genOf(key: String): Int =
    key.drop(1).takeWhile(_.isDigit).toInt

  /** Resolve `df`'s `comp` column through the remap chain: apply each
    * merge-sized remap table in append order (each at most once — the
    * append-time full resolution guarantees a remap's old_comp is a
    * root of the PREVIOUS generation, so one ordered pass reaches the
    * current root; no fixpoint loop needed).
    */
  private def resolve(df: DataFrame, remaps: Seq[DataFrame]): DataFrame =
    remaps.foldLeft(df) { (acc, r) =>
      acc.join(broadcast(r), acc("comp") === r("old_comp"), "left")
        .select(acc.columns.filterNot(_ == "comp").map(col) :+
          coalesce(col("new_comp"), col("comp")).as("comp"): _*)
    }

  /** Ingest a batch of undirected edges (two node columns): committed
    * labels for the touched nodes load (pruned), the batch contracts to
    * component roots, CC runs on the contracted graph, and the
    * batch-sized deltas commit as one marked ingest. Returns
    * (new nodes labeled, components merged).
    */
  def append(spark: SparkSession, dir: String, edges: DataFrame,
             nodeCol: String = "node",
             lsmBuckets: Int = StoreProtocol.WideLsmBuckets): (Long, Long) = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(spark, root)
    StoreProtocol.heal(fs, root)
    val committed = committedKeys(fs, root)
    val pinnedBuckets =
      if (committed.isEmpty) lsmBuckets
      else {
        val storedNode = readMeta(spark, dir)
        require(storedNode == nodeCol,
          s"GraphStore.append: store at $dir is keyed on '$storedNode', " +
            s"got '$nodeCol'")
        bucketsOf(spark, dir) // recorded layout is authoritative
      }
    // sweep orphans (the SpanStore append discipline)
    Seq("labels", "remap", "edges").foreach { t =>
      val tdir = new org.apache.hadoop.fs.Path(s"$dir/$t")
      if (fs.exists(tdir))
        fs.listStatus(tdir).map(_.getPath)
          .filter(p => p.getName.startsWith("ingest=") &&
            !committed.contains(p.getName.stripPrefix("ingest=")))
          .foreach(p => fs.delete(p, true))
    }
    val Array(ea, eb) = edges.columns.take(2)
    val e = edges.select(col(ea).cast("long").as("a"), col(eb).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint(true)
    val touched = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node"))).distinct()
      .localCheckpoint(true)
    if (touched.isEmpty) return (0L, 0L) // empty batch: nothing to log
    // committed labels of touched nodes, fully resolved to current roots
    val known =
      if (committed.isEmpty) touched.limit(0).withColumn("comp", col("node"))
      else resolve(
        readLabels(spark, dir, fs, committed, Some(touched), pinnedBuckets)
          .join(broadcast(touched), Seq("node"), "left_semi"),
        remapTables(spark, dir, fs, committed))
        .localCheckpoint(true)
    // contract: every endpoint becomes its current root (new nodes are
    // their own root), then CC on the batch-sized contracted graph
    val lbl = touched.join(known, Seq("node"), "left")
      .select(col("node"), coalesce(col("comp"), col("node")).as("comp"))
      .localCheckpoint(true)
    val la = lbl.select(col("node").as("a"), col("comp").as("ca"))
    val lb = lbl.select(col("node").as("b"), col("comp").as("cb"))
    val contracted = e.join(la, "a").join(lb, "b")
      .select(col("ca").as("id_a"), col("cb").as("id_b"))
      .filter(col("id_a") =!= col("id_b")).distinct()
    val roots = lbl.select(col("comp").as("node")).distinct()
      .localCheckpoint(true)
    // the batch CC's full root→root mapping; the PERSISTED remap keeps
    // only the COMMITTED roots' rows (read-time resolution exists for
    // rows already on disk — a new node's root changing is just its
    // initial labeling, not a merge, and recording it would miscount
    // merges and bloat the chain)
    val fullMap = Dedup.clusterReps(roots, contracted, "node")
      .filter(col("node") =!= col("rep_id"))
      .select(col("node").as("old_comp"), col("rep_id").as("new_comp"))
      .localCheckpoint(true)
    val merged = fullMap.join(
        known.select(col("comp").as("old_comp")).distinct(),
        Seq("old_comp"), "left_semi")
      .localCheckpoint(true)
    val merges = merged.count()
    // new nodes' labels: their batch-CC root through the FULL map (a
    // new node whose pre-CC root was another new node must land on the
    // final root — the persisted remap never sees that hop)
    val newNodes = lbl.join(known.select("node"), Seq("node"), "left_anti")
      .join(fullMap, col("comp") === col("old_comp"), "left")
      .select(col("node"),
        coalesce(col("new_comp"), col("comp")).as("comp"))
      .localCheckpoint(true)
    val fresh = newNodes.count()
    // EVERY non-empty batch commits, even when it labels nothing and
    // merges nothing: a new-but-redundant edge (both endpoints known,
    // same component) changes no label TODAY but must enter the edge
    // log, or a later forget of a parallel path would split a component
    // the true graph keeps connected — forget's exactness rides on the
    // log being complete (review catch r13). A genuine replay therefore
    // appends a duplicate edges-only ingest (distinct()-collapsed at
    // consolidation, bounded by re-delivery count, folded by compact);
    // labels and resolution are untouched either way.
    //
    // key hash over the TOUCHED set, not the new nodes: a replayed or
    // merge-only batch still needs a deterministic key so a crashed
    // attempt's retry overwrites its own orphan
    val contentHash = touched
      .agg(format_string("%016x", bit_xor(xxhash64(col("node").cast("string")))))
      .head().getString(0).take(12)
    val gen = committed.map(genOf).sorted.lastOption.getOrElse(-1) + 1
    val key = s"i${gen}_$contentHash"
    // labels write is unconditional (possibly empty): every committed
    // ingest must carry a labels dir for the multi-path reader
    newNodes.write.mode("overwrite").parquet(s"$dir/labels/ingest=$key")
    if (merges > 0L)
      merged.write.mode("overwrite").parquet(s"$dir/remap/ingest=$key")
    e.write.mode("overwrite").parquet(s"$dir/edges/ingest=$key")
    if (committed.isEmpty) {
      import spark.implicits._
      require(lsmBuckets >= 1,
        s"GraphStore.append: lsmBuckets must be >= 1, got $lsmBuckets")
      Seq((nodeCol, lsmBuckets)).toDF("node_col", "lsm_buckets")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    }
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "_commits"))
    fs.create(new org.apache.hadoop.fs.Path(root, s"_commits/$key"), true)
      .close()
    (fresh, merges)
  }

  /** The full resolved labeling: (nodeCol, component), every node ever
    * ingested, labels current through the whole remap chain.
    */
  def labels(spark: SparkSession, dir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(spark, root)
    StoreProtocol.heal(fs, root)
    val committed = committedKeys(fs, root)
    require(committed.nonEmpty, s"GraphStore.labels: nothing committed at $dir")
    val nodeCol = readMeta(spark, dir)
    resolve(readLabels(spark, dir, fs, committed, touched = None,
          bucketsOf(spark, dir)),
        remapTables(spark, dir, fs, committed))
      .select(col("node").as(nodeCol), col("comp").as("component"))
  }

  /** Point lookup: current components of `nodes` (one column). Nodes
    * never ingested are absent. The label read prunes to the nodes'
    * buckets once the base is compacted.
    */
  def componentOf(spark: SparkSession, dir: String,
                  nodes: DataFrame): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(spark, root)
    StoreProtocol.heal(fs, root)
    val committed = committedKeys(fs, root)
    require(committed.nonEmpty,
      s"GraphStore.componentOf: nothing committed at $dir")
    val nodeCol = readMeta(spark, dir)
    val want = nodes.select(col(nodes.columns.head).cast("long").as("node"))
      .distinct().localCheckpoint(true)
    resolve(
        readLabels(spark, dir, fs, committed, Some(want),
            bucketsOf(spark, dir))
          .join(broadcast(want), Seq("node"), "left_semi"),
        remapTables(spark, dir, fs, committed))
      .select(col("node").as(nodeCol), col("comp").as("component"))
  }

  /** Fold the ingest partitions into ONE retained set: labels fully
    * resolved (remap chain becomes empty — read-time resolution resets
    * to zero joins) and re-laid out bucketed; edges concatenate.
    * Returns (ingests before, after).
    */
  def compact(spark: SparkSession, dir: String, lsmBuckets: Int = 0): (Int, Int) =
    Lease.withLease(spark, dir, "GraphStore.compact") {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = fsOf(spark, root)
      StoreProtocol.heal(fs, root)
      val keys = committedKeys(fs, root)
      val before = keys.length
      val sameLayout = lsmBuckets == 0 ||
        (before > 0 && lsmBuckets == bucketsOf(spark, dir))
      val alreadyBase = before == 1 && sameLayout &&
        StoreProtocol.splitLsmLayout(fs, s"$dir/labels", keys)._2.isEmpty
      if (before == 0 || alreadyBase) (before, before)
      else {
        consolidate(spark, dir, None,
          if (lsmBuckets > 0) Some(lsmBuckets) else None)
        (before, 1)
      }
    }

  /** Retract EDGES (two node columns, same shape as [[append]]'s input).
    * Splits are fundamental here: removing an edge can disconnect
    * anything that routed through it, so this is priced as a REBUILD —
    * CC recomputes over the surviving stored edges, labels rewrite, and
    * the store consolidates to one ingest. Exact, loud about its cost.
    * Nodes left with no edges keep self-labels (they were once seen).
    * Returns edges removed.
    */
  def forget(spark: SparkSession, dir: String, edges: DataFrame): Long =
    Lease.withLease(spark, dir, "GraphStore.forget") {
      val Array(ea, eb) = edges.columns.take(2)
      consolidate(spark, dir, Some(edges
        .select(col(ea).cast("long").as("a"), col(eb).cast("long").as("b"))))
    }

  private def consolidate(spark: SparkSession, dir: String,
                          drop: Option[DataFrame],
                          migrateBuckets: Option[Int] = None): Long = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(spark, root)
    StoreProtocol.heal(fs, root)
    val committed = committedKeys(fs, root)
    if (committed.isEmpty) return 0L
    val nodeCol = readMeta(spark, dir)
    val buckets = migrateBuckets.getOrElse(bucketsOf(spark, dir))
    val allEdges = spark.read
      .parquet(committed.map(c => s"$dir/edges/ingest=$c"): _*)
      .distinct().localCheckpoint(true)
    // drop set symmetric: (a,b) retracts the stored edge either way round
    val (survivors, removed) = drop match {
      case Some(d) =>
        val dd = d.filter(col("a") =!= col("b")).distinct()
        val sym = dd.unionByName(
          dd.select(col("b").as("a"), col("a").as("b"))).localCheckpoint(true)
        val kept = allEdges.join(sym, Seq("a", "b"), "left_anti")
          .localCheckpoint(true)
        (kept, allEdges.count() - kept.count())
      case None => (allEdges, 0L)
    }
    if (drop.isDefined && removed == 0L) return 0L
    val nodes = readLabels(spark, dir, fs, committed, touched = None,
        buckets)
      .select(col("node")).distinct().localCheckpoint(true)
    val relabeled = Dedup.clusterReps(nodes,
        survivors.select(col("a").as("id_a"), col("b").as("id_b")), "node")
      .select(col("node"), col("rep_id").as("comp"))
    val stats = nodes
      .agg(count(lit(1)), format_string("%016x",
        bit_xor(xxhash64(col("node").cast("string")))))
      .head()
    val tmp = new org.apache.hadoop.fs.Path(dir + "__consolidate")
    fs.delete(tmp, true)
    fs.mkdirs(tmp)
    if (stats.getLong(0) > 0L) {
      val gen = committed.map(genOf).sorted.lastOption.getOrElse(-1) + 1
      val key = s"r${gen}_${stats.getString(1).take(12)}"
      StoreProtocol.writeLsmBase(relabeled, "node",
        s"$tmp/labels/ingest=$key", buckets)
      survivors.write.mode("overwrite").parquet(s"$tmp/edges/ingest=$key")
      import spark.implicits._
      Seq((nodeCol, buckets)).toDF("node_col", "lsm_buckets")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/meta")
      fs.mkdirs(new org.apache.hadoop.fs.Path(tmp, "_commits"))
      fs.create(new org.apache.hadoop.fs.Path(tmp, s"_commits/$key"), true)
        .close()
    }
    StoreProtocol.swapInto(fs, tmp, root, "GraphStore.consolidate")
    removed
  }
}
