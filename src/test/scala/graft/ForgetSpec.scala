package graft

import org.apache.spark.sql.functions._

import graft.streaming.IncrementalStream
import graft.warehouse.Warehouse

/** Retraction (`forget`) across every persisted store — the
  * takedown/opt-out lifecycle seam: a retracted id must (a) stop being
  * served from every index, (b) stop BLOCKING re-admission of its own
  * near-dups in every dedup ingest path, and (c) physically leave the
  * files. Each store's forget is pinned here end to end.
  */
class ForgetSpec extends SparkSpec {
  import spark.implicits._

  test("warehouse forget: anti-join delete, partition-scoped variant " +
    "removes fully-emptied partition directories") {
    val wh = new Warehouse(spark, tempDir("forget_wh"))
    val rows = (0L until 100L).map(i => (i, s"name_$i", s"d${i % 4}"))
      .toDF("id", "name", "day")
    wh.overwrite("flat", rows)
    val removed = wh.forget("flat", Seq(3L, 7L, 999L).toDF("id"), "id")
    assert(removed == 2L)
    assert(wh.read("flat").count() == 98)
    assert(wh.read("flat").filter(col("id").isin(3L, 7L)).count() == 0)
    // forgetting nothing is a no-op (no rewrite churn)
    assert(wh.forget("flat", Seq(999L).toDF("id"), "id") == 0L)

    wh.appendPartitioned("parted", rows, "day")
    // retract ALL of day d3 plus one row of d1: d3's directory must go,
    // d1 rewrites in place, d0/d2 untouched
    val d3Ids = (0L until 100L).filter(_ % 4 == 3)
    val removedP = wh.forget("parted", (d3Ids :+ 1L).toDF("id"), "id",
      partitionCol = Some("day"))
    assert(removedP == d3Ids.length + 1)
    val back = wh.read("parted")
    assert(back.count() == 100 - d3Ids.length - 1)
    assert(back.filter(col("day") === "d3").count() == 0)
    assert(!new java.io.File(s"${wh.root}/parted/day=d3").exists(),
      "fully-retracted partition directory must be deleted")
    assert(new java.io.File(s"${wh.root}/parted/day=d0").exists())
    // retract EVERYTHING that remains: the table must stay readable as
    // an empty-but-schemaed table (r10 code-review catch — deleting all
    // partition dirs would otherwise fail the next read's schema
    // inference)
    val rest = wh.read("parted").select("id").as[Long].collect()
    assert(wh.forget("parted", rest.toSeq.toDF("id"), "id",
      partitionCol = Some("day")) == rest.length)
    assert(wh.read("parted").count() == 0)
    assert(wh.read("parted").columns.toSeq == Seq("id", "name", "day"))
  }

  test("fuzzy-state forget: a retracted doc leaves all three state tables " +
    "and stops blocking its near-dup's re-admission") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val stateDir = tempDir("forget_fz_state")
    val in = tempDir("forget_fz_in")
    val ck = tempDir("forget_fz_ck")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "cat watches from the warm windowsill in the late afternoon sun"
    val nearDup = base.replace("late afternoon", "early morning")
    val other = "completely unrelated second document body about spark " +
      "query engines shuffling partitions across a thousand executors"
    def drain(): Unit =
      IncrementalStream.fuzzyDedupIngest(
          spark.readStream.schema(schema).parquet(in), stateDir, ck)
        .awaitTermination()
    def committedDocs: Set[Long] = {
      val commits = new java.io.File(s"$stateDir/_commits").listFiles()
      val keys = if (commits == null) Seq.empty
        else commits.map(_.getName).filterNot(n =>
          n.startsWith(".") || n.startsWith("_")).toSeq
      if (keys.isEmpty) Set.empty
      else spark.read.parquet(keys.map(k => s"$stateDir/docs/ingest=$k"): _*)
        .select("doc_id").as[Long].collect().toSet
    }
    Seq((1L, base), (2L, other)).toDF("doc_id", "text")
      .write.mode("append").parquet(in)
    drain()
    assert(committedDocs == Set(1L, 2L))
    // near-dup of committed doc 1 is blocked
    Seq((11L, nearDup)).toDF("doc_id", "text").write.mode("append").parquet(in)
    drain()
    assert(committedDocs == Set(1L, 2L))
    // retract doc 1: it leaves docs AND bands AND shingles
    val removed = IncrementalStream.forgetFuzzyState(spark, stateDir,
      Seq(1L).toDF("doc_id"))
    assert(removed == 1L)
    assert(committedDocs == Set(2L))
    Seq("bands", "shingles").foreach { t =>
      val dirs = new java.io.File(s"$stateDir/$t").listFiles()
        .map(f => s"$stateDir/$t/${f.getName}").toSeq
      assert(spark.read.parquet(dirs: _*)
        .filter(col("doc_id") === 1L).count() == 0, t)
    }
    // the same near-dup now ADMITS (nothing blocks it any more)
    Seq((21L, nearDup)).toDF("doc_id", "text").write.mode("append").parquet(in)
    drain()
    assert(committedDocs == Set(2L, 21L))
    // forgetting the whole corpus resets to empty-committed state —
    // and the next ingest starts from scratch
    assert(IncrementalStream.forgetFuzzyState(spark, stateDir,
      Seq(2L, 21L).toDF("doc_id")) == 2L)
    assert(committedDocs == Set.empty[Long])
    Seq((31L, base)).toDF("doc_id", "text").write.mode("append").parquet(in)
    drain()
    assert(committedDocs == Set(31L))
  }

  test("media store forget: a retracted doc's frames leave the store and " +
    "its perceptual copy re-admits") {
    import graft.operators.{MediaHashStore, Multimodal}
    import Multimodal.Codec
    import org.apache.spark.sql.Row
    val in = tempDir("forget_md_in")
    val store = tempDir("forget_md_store")
    val ck = tempDir("forget_md_ck")
    def mediaDf(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    def bmp(id: Long, text: String) = {
      val b = Codec.synthBmp(text.getBytes("UTF-8"), id)
      Row(id, b, "image/bmp", b.length.toLong)
    }
    def drain(): Unit =
      IncrementalStream.mediaDedupIngest(
          spark.readStream.schema(Multimodal.mediaSchema).parquet(in),
          store, ck)
        .awaitTermination()
    def storedDocs: Set[Long] =
      if (!MediaHashStore.exists(spark, store)) Set.empty
      else MediaHashStore.read(spark, store)
        .select("doc_id").distinct().as[Long].collect().toSet
    val tA = "picture content for the retraction test image number one"
    mediaDf(Seq(bmp(2L, tA), bmp(4L, "a different second picture body")))
      .write.mode("append").parquet(in)
    drain()
    assert(storedDocs == Set(2L, 4L))
    // an upscaled copy of committed image 2 is blocked
    val up = Codec.resizeBmp(Codec.synthBmp(tA.getBytes("UTF-8"), 2L),
      (4 + tA.length % 29) * 2, (4 + 2 % 13).toInt * 2).get
    mediaDf(Seq(Row(100L, up, "image/bmp", up.length.toLong)))
      .write.mode("append").parquet(in)
    drain()
    assert(storedDocs == Set(2L, 4L))
    // retract doc 2: frames physically leave, the copy re-admits
    assert(MediaHashStore.forget(spark, store, Seq(2L).toDF("doc_id")) == 1L)
    assert(storedDocs == Set(4L))
    mediaDf(Seq(Row(101L, up, "image/bmp", up.length.toLong)))
      .write.mode("append").parquet(in)
    drain()
    assert(storedDocs == Set(4L, 101L))
    // forgetting every remaining doc un-creates the store; the next
    // ingest recreates it from scratch
    assert(MediaHashStore.forget(spark, store,
      Seq(4L, 101L).toDF("doc_id")) == 2L)
    assert(!MediaHashStore.exists(spark, store))
    mediaDf(Seq(bmp(6L, "a brand new post-reset image body here")))
      .write.mode("append").parquet(in)
    drain()
    assert(storedDocs == Set(6L))
  }

  test("bm25 forget == an index built fresh over the survivors, bit for " +
    "bit; a retracted doc never ranks again") {
    import graft.operators.Retrieval
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(300).localCheckpoint(true)
    val dir = tempDir("forget_bm25")
    Retrieval.buildBm25Index(docs, "text", "doc_id", s"$dir/idx")
    val terms = Seq((1L, "the"), (1L, "data"), (2L, "of"), (2L, "a"))
      .toDF("query_id", "term")
    val before = Retrieval.bm25TopKFromIndex(spark, s"$dir/idx", terms, k = 10)
      .as[(Long, Long, Long, Double)].collect()
    assert(before.nonEmpty)
    // retract the top-ranked docs of query 1 — the strongest signal that
    // scores genuinely re-derive (df/avgdl shift for everyone else)
    val victims = before.filter(_._1 == 1L).sortBy(_._2).take(3).map(_._3)
    val removed = Retrieval.forgetBm25(spark, s"$dir/idx",
      victims.toSeq.toDF("doc_id"))
    assert(removed == victims.length)
    val after = Retrieval.bm25TopKFromIndex(spark, s"$dir/idx", terms, k = 10)
      .as[(Long, Long, Long, Double)].collect()
    assert(!after.exists(r => victims.contains(r._3)))
    // ≡ a fresh build over the surviving corpus, bit for bit
    val freshDir = tempDir("forget_bm25_fresh")
    Retrieval.buildBm25Index(
      docs.filter(!col("doc_id").isin(victims.toIndexedSeq: _*)),
      "text", "doc_id", s"$freshDir/idx")
    val fresh = Retrieval.bm25TopKFromIndex(spark, s"$freshDir/idx", terms, 10)
      .as[(Long, Long, Long, Double)].collect()
    assert(after.sortBy(r => (r._1, r._2)).toSeq ==
      fresh.sortBy(r => (r._1, r._2)).toSeq)
    // crash window: a forget that died between its two renames parks the
    // index at __old — the NEXT forget heals it first and still applies
    // (the retraction-ingest replay path; r10 code-review catch)
    val fs = new org.apache.hadoop.fs.Path(s"$freshDir/idx")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$freshDir/idx"),
      new org.apache.hadoop.fs.Path(s"$freshDir/idx__old")))
    val crashVictim = fresh.head._3
    assert(Retrieval.forgetBm25(spark, s"$freshDir/idx",
      Seq(crashVictim).toDF("doc_id")) == 1L)
    assert(!Retrieval.bm25TopKFromIndex(spark, s"$freshDir/idx", terms, 10)
      .as[(Long, Long, Long, Double)].collect().exists(_._3 == crashVictim))
    // forgetting an id with no postings is a no-op
    assert(Retrieval.forgetBm25(spark, s"$dir/idx",
      Seq(999999L).toDF("doc_id")) == 0L)
    // forgetting everything un-commits the index
    val allIds = spark.read.parquet(s"$dir/idx/doc_len")
      .select("doc_id").as[Long].collect()
    assert(Retrieval.forgetBm25(spark, s"$dir/idx",
      allIds.toSeq.toDF("doc_id")) == allIds.length)
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25TopKFromIndex(spark, s"$dir/idx", terms, 10)
    }
    assert(e.getMessage.contains("stats marker"))
  }

  test("ANN forget: cell-pruned delete — retracted vectors never return, " +
    "near-dups re-admit, emptied cell directories leave the disk") {
    import graft.operators.AnnIndex
    val all = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .localCheckpoint(true)
    val dir = tempDir("forget_ann")
    AnnIndex.buildIvf(all, "embedding", "vec_id", dir, nlist = 4, iters = 3)
    val victim = all.filter(col("vec_id") === 7L)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    // before: the victim self-matches through the screen at cosine 1
    val hit = AnnIndex.screenIvf(spark, dir, victim, "embedding", "vec_id",
      threshold = 0.999, nprobe = 4)
    assert(hit.filter(col("id_b") === 7L).count() == 1)
    val nBefore = spark.read.parquet(s"$dir/corpus").count()
    assert(AnnIndex.forgetIvf(spark, dir, Seq(7L).toDF("vec_id"), "vec_id") == 1L)
    val corpus = spark.read.parquet(s"$dir/corpus")
    assert(corpus.count() == nBefore - 1)
    assert(corpus.filter(col("vec_id") === 7L).count() == 0)
    // the screen no longer blocks: the identical vector re-admits...
    assert(AnnIndex.screenIvf(spark, dir, victim, "embedding", "vec_id",
      threshold = 0.999, nprobe = 4).count() == 0)
    AnnIndex.appendIvf(victim, "embedding", "vec_id", dir)
    // ...and serves again
    assert(AnnIndex.screenIvf(spark, dir, victim, "embedding", "vec_id",
      threshold = 0.999, nprobe = 4).filter(col("id_b") === 7L).count() == 1)
    // retract an ENTIRE cell: its partition directory must leave the disk
    // and the pruned layout must stay readable
    val cellOf7 = spark.read.parquet(s"$dir/corpus")
      .filter(col("vec_id") === 7L).select(col("cell_id").cast("long"))
      .head().getLong(0)
    val cellIds = spark.read.parquet(s"$dir/corpus")
      .filter(col("cell_id").cast("long") === cellOf7)
      .select("vec_id").as[Long].collect()
    assert(AnnIndex.forgetIvf(spark, dir, cellIds.toSeq.toDF("vec_id"),
      "vec_id") == cellIds.length)
    assert(!new java.io.File(s"$dir/corpus/cell_id=$cellOf7").exists(),
      "fully-retracted cell directory must be deleted")
    val left = spark.read.parquet(s"$dir/corpus")
    assert(left.count() == nBefore - cellIds.length)
    assert(left.filter(col("cell_id").cast("long") === cellOf7).count() == 0)
    // untouched cells still serve queries
    val q = all.filter(col("vec_id") === 2L)
      .select(col("vec_id"), col("embedding"))
    assert(AnnIndex.queryIvf(spark, dir, q, "embedding", "vec_id",
      k = 5, nprobe = 4).count() > 0)
  }

  test("serving-stack forget: a retracted doc vanishes from both legs, " +
    "fetch, and every artifact; other docs still serve") {
    import graft.pipeline.RetrievePipeline
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dir = tempDir("forget_rp")
    RetrievePipeline.build(docs, "text", "doc_id", dir,
      chunkTokens = 32, stride = 32, dim = 32, salt = "rp", nlist = 4,
      iters = 3)
    // a verbatim chunk query pins doc 7 at rank 1 through BOTH legs
    val sampleChunk = graft.operators.CorpusOps.chunkDocs(
        docs, "doc_id", "text", 32, 32)
      .filter(col("chunk_idx") === 0 && col("doc_id") === 7)
      .select(col("chunk_text")).as[String].head()
    val queries = Seq((1L, sampleChunk)).toDF("query_id", "text")
    def serve() = RetrievePipeline.query(spark, dir, queries, k = 5, nprobe = 4)
    assert(serve().filter(col("rank") === 1).head().getLong(3) == 7L)
    val removed = RetrievePipeline.forget(spark, dir, Seq(7L).toDF("doc_id"))
    assert(removed >= 1L)
    val after = RetrievePipeline.fetchChunks(spark, dir, serve())
      .localCheckpoint(true)
    // the retracted doc is gone from results AND the passage store;
    // every surviving result still fetches its text
    assert(after.filter(col("doc_id") === 7L).count() == 0)
    assert(after.count() > 0, "other docs must still serve")
    assert(after.filter(col("chunk_text").isNull).count() == 0)
    // physically gone from all four artifacts
    assert(spark.read.parquet(s"$dir/chunks")
      .filter(shiftright(col("chunk_id"), 20) === 7L).count() == 0)
    assert(spark.read.parquet(s"$dir/vectors")
      .filter(shiftright(col("chunk_id"), 20) === 7L).count() == 0)
    assert(spark.read.parquet(s"$dir/bm25/postings")
      .filter(shiftright(col("chunk_id"), 20) === 7L).count() == 0)
    assert(spark.read.parquet(s"$dir/ann/corpus")
      .filter(shiftright(col("chunk_id"), 20) === 7L).count() == 0)
    // a forget of unknown ids is a no-op
    assert(RetrievePipeline.forget(spark, dir, Seq(999999L).toDF("doc_id")) == 0L)
    // replay-after-crash: a forget that died AFTER the downstream
    // artifacts (bm25/ann) but BEFORE the chunk prune re-runs cleanly —
    // the drop set recomputes from the still-intact chunks, downstream
    // forgets no-op on rows already gone, and the chunks finally prune
    // (chunks-last ordering, r10 code-review catch: pruned first, the
    // replay would recompute an EMPTY drop set and strand doc 9 in the
    // indexes forever)
    val doc9Chunks = spark.read.parquet(s"$dir/chunks")
      .filter(shiftright(col("chunk_id"), 20) === 9L)
      .select("chunk_id").localCheckpoint(true)
    val n9 = doc9Chunks.count()
    assert(n9 > 0)
    graft.operators.Retrieval.forgetBm25Incremental(spark, s"$dir/bm25", doc9Chunks)
    graft.operators.AnnIndex.forgetIvf(spark, s"$dir/ann", doc9Chunks, "chunk_id")
    // the "replayed batch": the full forget still completes the job
    assert(RetrievePipeline.forget(spark, dir, Seq(9L).toDF("doc_id")) == n9)
    assert(spark.read.parquet(s"$dir/chunks")
      .filter(shiftright(col("chunk_id"), 20) === 9L).count() == 0)
    assert(spark.read.parquet(s"$dir/vectors")
      .filter(shiftright(col("chunk_id"), 20) === 9L).count() == 0)
  }

  test("retraction ingest: one takedown stream retracts across every " +
    "configured store; a fresh-checkpoint replay is a no-op") {
    import graft.operators.{AnnIndex, MediaHashStore, Multimodal, Retrieval}
    import Multimodal.Codec
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(100).localCheckpoint(true)
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .localCheckpoint(true)
    // --- build the stores a live pipeline would hold
    val fuzzyDir = tempDir("ri_fuzzy")
    val fuzzyIn = tempDir("ri_fuzzy_in")
    val texts = Seq(
      (1L, "the first committed document body with plenty of words in it"),
      (2L, "a second document about takedown requests arriving as a stream"),
      (3L, "the third unrelated committed body of text for this fixture"))
    texts.toDF("doc_id", "text").write.mode("append").parquet(fuzzyIn)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    IncrementalStream.fuzzyDedupIngest(
        spark.readStream.schema(schema).parquet(fuzzyIn), fuzzyDir,
        tempDir("ri_fuzzy_ck"))
      .awaitTermination()
    val mediaDir = tempDir("ri_media")
    def bmp(id: Long, t: String) = {
      val b = Codec.synthBmp(t.getBytes("UTF-8"), id)
      Row(id, b, "image/bmp", b.length.toLong)
    }
    val mediaIn = tempDir("ri_media_in")
    spark.createDataFrame(spark.sparkContext.parallelize(
        Seq(bmp(2L, "picture two body"), bmp(4L, "picture four body"))),
      Multimodal.mediaSchema).write.mode("append").parquet(mediaIn)
    IncrementalStream.mediaDedupIngest(
        spark.readStream.schema(Multimodal.mediaSchema).parquet(mediaIn),
        mediaDir, tempDir("ri_media_ck"))
      .awaitTermination()
    val annDir = tempDir("ri_ann")
    AnnIndex.buildIvf(embs, "embedding", "vec_id", annDir, nlist = 4, iters = 2)
    val bm25Dir = tempDir("ri_bm25")
    Retrieval.buildBm25Index(docs, "text", "doc_id", s"$bm25Dir/idx")
    val wh = new Warehouse(spark, tempDir("ri_wh"))
    wh.overwrite("docs_t", docs.select("doc_id", "text"))
    // --- the takedown feed: two batches, ids 2 then 7
    val feedIn = tempDir("ri_feed")
    val feedCk = tempDir("ri_feed_ck")
    val targets = IncrementalStream.RetractionTargets(
      fuzzyStateDir = Some(fuzzyDir),
      mediaStoreDir = Some(mediaDir),
      annIndexes = Seq((annDir, "vec_id")),
      bm25Indexes = Seq(s"$bm25Dir/idx"),
      warehouse = Some(wh),
      warehouseTables = Seq(("docs_t", "doc_id", None)))
    def drainFeed(ck: String): Unit =
      IncrementalStream.retractionIngest(
          spark.readStream
            .schema(StructType(Seq(StructField("doc_id", LongType))))
            .parquet(feedIn),
          targets, ck)
        .awaitTermination()
    Seq(2L).toDF("doc_id").write.mode("append").parquet(feedIn)
    drainFeed(feedCk)
    Seq(7L).toDF("doc_id").write.mode("append").parquet(feedIn)
    drainFeed(feedCk)
    // --- every store retracted ids 2 and 7
    def snapshot(): Seq[Long] = Seq(
      spark.read.parquet(s"$fuzzyDir/docs").count(),
      MediaHashStore.read(spark, mediaDir).count(),
      spark.read.parquet(s"$annDir/corpus").count(),
      spark.read.parquet(s"$bm25Dir/idx/doc_len").count(),
      wh.read("docs_t").count())
    val commits = new java.io.File(s"$fuzzyDir/_commits").listFiles()
      .map(_.getName).filterNot(n => n.startsWith(".") || n.startsWith("_"))
    val fuzzyDocs = spark.read.parquet(
        commits.map(k => s"$fuzzyDir/docs/ingest=$k"): _*)
      .select("doc_id").as[Long].collect().toSet
    assert(fuzzyDocs == Set(1L, 3L))
    assert(MediaHashStore.read(spark, mediaDir)
      .select("doc_id").as[Long].collect().toSet == Set(4L))
    assert(spark.read.parquet(s"$annDir/corpus")
      .filter(col("vec_id").isin(2L, 7L)).count() == 0)
    assert(spark.read.parquet(s"$bm25Dir/idx/doc_len")
      .filter(col("doc_id").isin(2L, 7L)).count() == 0)
    assert(wh.read("docs_t").filter(col("doc_id").isin(2L, 7L)).count() == 0)
    val before = snapshot()
    // --- fresh-checkpoint FULL replay: forget of absent ids is a no-op,
    // so every store is unchanged
    drainFeed(tempDir("ri_feed_ck2"))
    assert(snapshot() == before, "replayed takedown batches must change nothing")
  }

  test("retraction ingest: incremental-BM25 lane (layout auto-detected), " +
    "string-keyed warehouse table, audit trail, loud unknown-layout failure") {
    import graft.operators.Retrieval
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(100).localCheckpoint(true)
    // an INCREMENTAL index (meta + _commits, no flat stats) — the layout
    // the r10 lane silently skipped
    val incrDir = s"${tempDir("rib_incr")}/idx"
    Retrieval.buildBm25Incremental(
      docs.filter(col("doc_id") % 2 === 0), "text", "doc_id", incrDir)
    Retrieval.appendBm25Incremental(spark, incrDir,
      docs.filter(col("doc_id") % 2 =!= 0), "text", "doc_id")
    // a flat index next to it: the SAME configured lane must route each
    // to its own forget
    val flatDir = s"${tempDir("rib_flat")}/idx"
    Retrieval.buildBm25Index(docs, "text", "doc_id", flatDir)
    // a STRING-keyed warehouse table: the r10 hard cast("long") nulled
    // these ids and the retraction silently no-oped (removed=0)
    val wh = new Warehouse(spark, tempDir("rib_wh"))
    wh.overwrite("by_name", docs.select(
      concat(lit("doc_"), col("doc_id")).as("name"), col("text")))
    val feedIn = tempDir("rib_feed")
    val audit = "takedown_audit"
    val targets = IncrementalStream.RetractionTargets(
      bm25Indexes = Seq(incrDir, flatDir),
      warehouse = Some(wh),
      warehouseTables = Seq(("by_name", "name", None)),
      auditTable = Some(audit))
    def drainFeed(ck: String): Unit =
      IncrementalStream.retractionIngest(
          spark.readStream
            .schema(StructType(Seq(StructField("doc_id", LongType))))
            .parquet(feedIn),
          targets, ck, idCol = "doc_id")
        .awaitTermination()
    // ids exist in the indexes; the string table is keyed doc_<id>, so
    // the long feed ids match NOTHING there (cast to string ≠ "doc_7") —
    // removed must be 0 for it, honestly recorded, while a string feed
    // against the same table works (second stream below)
    Seq(7L, 8L).toDF("doc_id").write.mode("append").parquet(feedIn)
    val ck = tempDir("rib_ck")
    drainFeed(ck)
    Seq("doc_len").foreach { _ =>
      val left = spark.read.parquet(s"$incrDir/doc_len")
      assert(left.filter(col("doc_id").isin(7L, 8L)).count() == 0,
        "incremental index must retract (the r10 silent-skip gap)")
    }
    assert(spark.read.parquet(s"$flatDir/doc_len")
      .filter(col("doc_id").isin(7L, 8L)).count() == 0)
    // the incremental index still serves the survivors
    val terms = Seq((1L, "the"), (1L, "data")).toDF("query_id", "term")
    val served = Retrieval.bm25TopKFromIncremental(spark, incrDir, terms, 10)
      .select("doc_id").as[Long].collect()
    assert(served.nonEmpty && !served.exists(Set(7L, 8L)))
    // audit trail: one row per (run, batch, store) with the forget's return
    val a1 = wh.read(audit)
      .select("batch_id", "store", "ids_count", "removed_count")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(a1.length == 3, s"3 stores configured, got $a1")
    assert(a1.forall(r => r._1 == 0L && r._3 == 2L))
    assert(a1.find(_._2 == s"bm25:$incrDir").get._4 == 2L)
    assert(a1.find(_._2 == s"bm25:$flatDir").get._4 == 2L)
    assert(a1.find(_._2 == "warehouse:by_name").get._4 == 0L,
      "long ids against a string-keyed table match nothing — recorded, not hidden")
    // a STRING feed retracts from the string-keyed table (untyped pass-
    // through + per-target cast)
    val feedIn2 = tempDir("rib_feed2")
    Seq("doc_3", "doc_4").toDF("name").write.mode("append").parquet(feedIn2)
    IncrementalStream.retractionIngest(
        spark.readStream
          .schema(StructType(Seq(StructField("name",
            org.apache.spark.sql.types.StringType)))).parquet(feedIn2),
        IncrementalStream.RetractionTargets(warehouse = Some(wh),
          warehouseTables = Seq(("by_name", "name", None)),
          auditTable = Some(audit)),
        tempDir("rib_ck2"), idCol = "name")
      .awaitTermination()
    assert(wh.read("by_name")
      .filter(col("name").isin("doc_3", "doc_4")).count() == 0)
    // the SECOND stream's removal is its own audit row — the run
    // component keeps two streams' batch-0 rows from colliding (a bare
    // (batch_id, store) key silently dropped this row: code-review catch)
    assert(wh.read(audit)
      .filter(col("store") === "warehouse:by_name" &&
        col("removed_count") === 2L).count() == 1L,
      "the string feed's removal must be recorded under its own run")
    // replay idempotency of the audit: a same-checkpoint re-drain offers
    // the same (run, batch_id, store) keys — nothing appends
    val nAudit = wh.read(audit).count()
    drainFeed(ck) // no new feed files: AvailableNow drains nothing new
    assert(wh.read(audit).count() == nAudit)
    // a FRESH checkpoint is a new run: it honestly records its own
    // batch-0 observation (removed=0 — the ids are long gone), without
    // touching the original run's rows (first-writer-wins per run)
    Seq(999999L).toDF("doc_id").write.mode("append").parquet(feedIn)
    val ck3 = tempDir("rib_ck3")
    drainFeed(ck3)
    // the run key is the QUALIFIED checkpoint location (r11 advice: a
    // re-spelled path must not mint a second run), so the lookup goes
    // through the same qualification
    def qualified(p: String): String = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(hp).toString
    }
    val replayRows = wh.read(audit).filter(col("run") === qualified(ck3))
      .select("removed_count").as[Long].collect().toSeq
    assert(replayRows.length == 3 && replayRows.forall(_ == 0L),
      s"the replay run must record honest no-op rows, got $replayRows")
    assert(wh.read(audit).filter(col("run") === ck3).count() == 0,
      "the audit run key is the QUALIFIED location — the raw spelling " +
        "must not appear (a re-spelled checkpoint would mint a second run)")
    assert(wh.read(audit)
      .filter(col("store") === s"bm25:$incrDir" && col("removed_count") === 2L)
      .count() == 1L, "the original run's rows must survive the replay")
    drainFeed(ck3) // same checkpoint again: nothing new drains or appends
    assert(wh.read(audit).count() == nAudit + 3)
    // a configured dir matching NEITHER layout fails the batch loudly
    val bogus = tempDir("rib_bogus")
    Seq((1L, "x")).toDF("a", "b").write.mode("overwrite")
      .parquet(s"$bogus/not_an_index")
    val feedIn3 = tempDir("rib_feed4")
    Seq(1L).toDF("doc_id").write.mode("append").parquet(feedIn3)
    val q = IncrementalStream.retractionIngest(
      spark.readStream
        .schema(StructType(Seq(StructField("doc_id", LongType))))
        .parquet(feedIn3),
      IncrementalStream.RetractionTargets(bm25Indexes = Seq(bogus)),
      tempDir("rib_ck4"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(e.getMessage.contains("neither BM25 layout") ||
      Option(e.getCause).exists(_.getMessage.contains("neither BM25 layout")))
  }
}
