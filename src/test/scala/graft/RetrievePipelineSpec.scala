package graft

import org.apache.spark.sql.functions._

import graft.pipeline.RetrievePipeline

/** End-to-end hybrid retrieval lifecycle: build once, query twice — the
  * second query must answer purely from the persisted artifacts (bytes
  * untouched, results bit-identical), both legs must contribute, and a
  * verbatim passage must surface its own chunk.
  */
class RetrievePipelineSpec extends SparkSpec {
  import spark.implicits._

  test("build once, query twice: frozen artifacts, exact-passage recall, fused legs") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dir = tempDir("retrieve")
    val stages = RetrievePipeline.build(docs, "text", "doc_id", dir,
      chunkTokens = 32, stride = 32, dim = 32, salt = "rp", nlist = 4,
      iters = 3)
    assert(stages.map(_.stage) == Seq("chunks", "bm25_postings", "ann_vectors"))
    assert(stages.forall(_.rows > 0), stages.toString)

    // queries: one verbatim chunk text (must surface its own chunk at
    // rank 1 — both legs score it maximal), one paraphrase-ish fragment
    val sampleChunk = graft.operators.CorpusOps.chunkDocs(
        docs, "doc_id", "text", 32, 32)
      .filter(col("chunk_idx") === 0 && col("doc_id") === 7)
      .select(col("chunk_text")).as[String].head()
    val queries = Seq((1L, sampleChunk),
      (2L, sampleChunk.split(" ").take(5).mkString(" ")))
      .toDF("query_id", "text")

    def snapshot(): Map[String, Long] = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) {
        val f = it.next()
        b += f.getPath.toString -> (f.getLen + f.getModificationTime)
      }
      b.result()
    }
    val before = snapshot()
    val r1 = RetrievePipeline.query(spark, dir, queries, k = 5, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq
    val r2 = RetrievePipeline.query(spark, dir, queries, k = 5, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(r1 == r2, "repeated queries must be bit-identical")
    assert(snapshot() == before,
      "the query path must not write, retrain, or mutate any artifact")

    val rows = RetrievePipeline.query(spark, dir, queries, k = 5, nprobe = 4)
      .as[(Long, Long, Long, Long, Double, Long)].collect()
    val top1 = rows.filter(r => r._1 == 1L && r._2 == 1L).head
    assert(top1._4 == 7L, s"verbatim chunk query must return doc 7 first: $top1")
    assert(top1._3 == (7L << 20), "and the chunk id must be doc 7's chunk 0")
    assert(top1._6 == 2L, "the top hit must be surfaced by BOTH legs")
    // chunk -> parent doc mapping holds on every row
    assert(rows.forall(r => r._4 == (r._3 >> 20)))
    // both queries answered
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq(1L, 2L))
    // the persisted chunk store serves passage text for the results —
    // the verbatim query's top hit must fetch back its own text
    val withText = RetrievePipeline.fetchChunks(spark, dir,
      RetrievePipeline.query(spark, dir, queries, k = 5, nprobe = 4))
    val fetched = withText
      .filter(col("query_id") === 1L && col("rank") === 1L)
      .select("chunk_text").as[String].head()
    assert(fetched == sampleChunk)
    assert(withText.filter(col("chunk_text").isNull).count() == 0,
      "every served chunk id must resolve in the store")
    // bulk regime (isinCap forced to 0 — every result is "too big" for
    // the driver id collect, so the store attaches through the semi-join
    // path instead): identical rows to the serving regime
    val bulk = RetrievePipeline.fetchChunks(spark, dir,
        RetrievePipeline.query(spark, dir, queries, k = 5, nprobe = 4),
        isinCap = 0L)
      .collect().map(_.toString).sorted.toSeq
    assert(bulk == withText.collect().map(_.toString).sorted.toSeq)
  }

  test("append grows every artifact without a rebuild: build-half + " +
    "append-half serves bit-identical to a one-shot build through both " +
    "legs; re-append no-ops; crash replay completes; append + forget " +
    "returns the original serve") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .localCheckpoint(true)
    val half = docs.filter(col("doc_id") % 2 === 0)
    val rest = docs.filter(col("doc_id") % 2 =!= 0)
    val grown = tempDir("rp_grown")
    val oneShot = tempDir("rp_oneshot")
    RetrievePipeline.build(half, "text", "doc_id", grown,
      chunkTokens = 32, stride = 32, dim = 32, salt = "rp", nlist = 4,
      iters = 3)
    // doc 7 is ODD — it arrives only through the append
    val sampleChunk = graft.operators.CorpusOps.chunkDocs(
        docs, "doc_id", "text", 32, 32)
      .filter(col("chunk_idx") === 0 && col("doc_id") === 7)
      .select(col("chunk_text")).as[String].head()
    val queries = Seq((1L, sampleChunk),
      (2L, sampleChunk.split(" ").take(5).mkString(" ")))
      .toDF("query_id", "text")
    // nprobe = nlist: the probe set is exhaustive, so serving is
    // CENTROID-INDEPENDENT — the grown stack (kmeans trained on half)
    // and the one-shot stack (trained on everything) must then serve
    // bit-identically through BOTH legs; at nprobe < nlist the two are
    // legitimately different indexes (different routing), not a bug
    def serve(d: String): Seq[String] =
      RetrievePipeline.query(spark, d, queries, k = 5, nprobe = 4)
        .collect().map(_.toString).sorted.toSeq
    val before = serve(grown)
    val stages = RetrievePipeline.append(rest, "text", "doc_id", grown)
    assert(stages.map(_.stage) == Seq("chunks", "bm25_chunks", "ann_vectors"))
    assert(stages.forall(_.rows > 0), stages.toString)
    RetrievePipeline.build(docs, "text", "doc_id", oneShot,
      chunkTokens = 32, stride = 32, dim = 32, salt = "rp", nlist = 4,
      iters = 3)
    assert(serve(grown) == serve(oneShot),
      "grown and one-shot stacks must serve identically at nprobe = nlist")
    // the appended doc actually surfaces, and its passage text fetches
    // back from the staged chunk commit
    val withText = RetrievePipeline.fetchChunks(spark, grown,
        RetrievePipeline.query(spark, grown, queries, k = 5, nprobe = 4))
      .localCheckpoint(true)
    assert(withText.filter(col("query_id") === 1L && col("rank") === 1L)
      .select("chunk_text").as[String].head() == sampleChunk)
    assert(withText.filter(col("chunk_text").isNull).count() == 0)
    // re-append of the same docs is a no-op (K2 at the doc gate)
    assert(RetrievePipeline.append(rest, "text", "doc_id", grown)
      .forall(_.rows == 0))
    // crash replay: a crash just before the chunk commit (every OTHER
    // artifact landed) leaves the docs "new" — simulate by deleting the
    // appended chunk batch dirs; the replayed append must land the
    // chunks while the per-artifact anti-joins no-op on what's there
    val chunksDir = new java.io.File(s"$grown/chunks")
    val batchDirs = chunksDir.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("b_"))
    assert(batchDirs.nonEmpty, "append must commit chunks as staged batch dirs")
    batchDirs.foreach { d =>
      val fs = new org.apache.hadoop.fs.Path(d.toString)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(d.toString), true)
    }
    val replay = RetrievePipeline.append(rest, "text", "doc_id", grown)
    assert(replay.find(_.stage == "chunks").get.rows > 0)
    assert(replay.find(_.stage == "bm25_chunks").get.rows == 0,
      "the BM25 ingest already committed — its own K2 gate must no-op")
    assert(replay.find(_.stage == "ann_vectors").get.rows == 0,
      "the ANN rows already landed — the id anti-join must no-op")
    assert(serve(grown) == serve(oneShot), "replay must converge")
    // append + forget compose: retracting the appended docs returns the
    // stack to its pre-append serve (forget ≡ fresh build over survivors,
    // and the surviving centroids ARE the original build's)
    val removed = RetrievePipeline.forget(spark, grown,
      rest.select("doc_id"))
    assert(removed > 0L)
    assert(serve(grown) == before,
      "add-then-retract must serve exactly like the original build")
  }

  test("bloom doc gate: bloom-guarded append serves identically to exact, " +
    "heals missing blooms, replays a crash, lifts the veto after forget, " +
    "and enforces the fp budget") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .localCheckpoint(true)
    val half = docs.filter(col("doc_id") % 2 === 0)
    val rest = docs.filter(col("doc_id") % 2 =!= 0)
    val grown = tempDir("rp_bloomg")
    val oneShot = tempDir("rp_bloomg_one")
    RetrievePipeline.build(half, "text", "doc_id", grown,
      chunkTokens = 32, stride = 32, dim = 32, salt = "rp", nlist = 4,
      iters = 3)
    RetrievePipeline.build(docs, "text", "doc_id", oneShot,
      chunkTokens = 32, stride = 32, dim = 32, salt = "rp", nlist = 4,
      iters = 3)
    val sampleChunk = graft.operators.CorpusOps.chunkDocs(
        docs, "doc_id", "text", 32, 32)
      .filter(col("chunk_idx") === 0 && col("doc_id") === 7)
      .select(col("chunk_text")).as[String].head()
    val queries = Seq((1L, sampleChunk),
      (2L, sampleChunk.split(" ").take(5).mkString(" ")))
      .toDF("query_id", "text")
    def serve(d: String): Seq[String] =
      RetrievePipeline.query(spark, d, queries, k = 5, nprobe = 4)
        .collect().map(_.toString).sorted.toSeq
    val fs = new org.apache.hadoop.fs.Path(grown)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // HEAL: drop the build's doc blooms — the first bloom-guarded append
    // must rebuild them from the chunk store's own parts and proceed
    fs.delete(new org.apache.hadoop.fs.Path(s"$grown/doc_blooms"), true)
    val stages = RetrievePipeline.append(rest, "text", "doc_id", grown,
      idGuard = "bloom")
    assert(stages.map(_.stage) == Seq("chunks", "bm25_chunks", "ann_vectors"))
    assert(stages.forall(_.rows > 0), stages.toString)
    // one bloom per part: the healed base + this append's batch
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$grown/doc_blooms"))
      .length == 2)
    assert(serve(grown) == serve(oneShot),
      "bloom-guarded growth must serve identically to the one-shot build")
    // replay of committed docs: every id hits its own part's bloom (no
    // false negatives), so the whole batch drops
    assert(RetrievePipeline.append(rest, "text", "doc_id", grown,
      idGuard = "bloom").forall(_.rows == 0))
    // crash replay in bloom mode: delete the committed chunk batch dirs
    // (the bloom files are now STALE — they claim docs whose part is
    // gone); the replay must sweep them, re-admit, and converge
    new java.io.File(s"$grown/chunks").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("b_"))
      .foreach(d => fs.delete(new org.apache.hadoop.fs.Path(d.toString), true))
    val replay = RetrievePipeline.append(rest, "text", "doc_id", grown,
      idGuard = "bloom")
    assert(replay.find(_.stage == "chunks").get.rows > 0,
      "stale blooms for a vanished part must be swept, not probed")
    assert(replay.find(_.stage == "bm25_chunks").get.rows == 0)
    assert(replay.find(_.stage == "ann_vectors").get.rows == 0)
    assert(serve(grown) == serve(oneShot), "bloom-mode replay must converge")
    // veto-lift: forget rebuilds the base bloom from the survivors, so
    // a retracted doc's id must NOT linger as a false-positive veto —
    // the same docs re-admit through the bloom gate
    assert(RetrievePipeline.forget(spark, grown, rest.select("doc_id")) > 0L)
    val back = RetrievePipeline.append(rest, "text", "doc_id", grown,
      idGuard = "bloom")
    assert(back.forall(_.rows > 0),
      "retracted docs must re-admit through the rebuilt bloom")
    assert(serve(grown) == serve(oneShot),
      "retract + bloom-guarded re-admit must restore the identical stack")
    // budget ceiling: 2 parts × pinned 1e-4 against a 1e-9 budget fails
    // loudly with the math instead of degrading silently
    val e = intercept[IllegalArgumentException] {
      RetrievePipeline.append(rest, "text", "doc_id", grown,
        idGuard = "bloom", bloomBudget = 1e-9)
    }
    assert(e.getMessage.contains("bloomBudget") &&
      e.getMessage.contains("compact"))
    // compact folds the parts (and blooms) to one — the gate re-arms
    RetrievePipeline.compact(spark, grown)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$grown/doc_blooms"))
      .length == 1)
    assert(RetrievePipeline.append(rest, "text", "doc_id", grown,
      idGuard = "bloom", bloomBudget = 1e-4).forall(_.rows == 0),
      "compacted stack still vetoes committed docs through the folded bloom")
    assert(serve(grown) == serve(oneShot))
  }

  test("bm25TopKFromIndex == in-run bm25TopK, bit for bit; uncommitted index refuses") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(200).localCheckpoint(true)
    val dir = tempDir("bm25idx")
    graft.operators.Retrieval.buildBm25Index(docs, "text", "doc_id", s"$dir/bm25")
    val terms = Seq((1L, "the"), (1L, "data"), (2L, "spark"), (2L, "of"))
      .toDF("query_id", "term")
    val inRun = graft.operators.Retrieval.bm25TopK(docs, "text", "doc_id",
        terms, k = 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    val persisted = graft.operators.Retrieval.bm25TopKFromIndex(spark,
        s"$dir/bm25", terms, k = 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(persisted == inRun)
    assert(persisted.nonEmpty)
    // crash window: stats marker missing -> clean refusal
    val statsPath = new org.apache.hadoop.fs.Path(s"$dir/bm25/stats")
    statsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(statsPath, true)
    val e = intercept[IllegalArgumentException] {
      graft.operators.Retrieval.bm25TopKFromIndex(spark, s"$dir/bm25", terms, 5)
    }
    assert(e.getMessage.contains("stats marker"))
  }
}
