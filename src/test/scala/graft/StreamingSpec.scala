package graft

import graft.streaming.IncrementalStream
import graft.warehouse.Warehouse

/** Structured-Streaming incremental load: AvailableNow drains the input
  * directory; re-running with a fresh checkpoint re-delivers everything and
  * the warehouse still converges (idempotent append = the state).
  */
class StreamingSpec extends SparkSpec {

  test("watermarked windowed aggregation over an unbounded stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = graft.streaming.IncrementalStream.windowedEventCounts(events, "1 hour")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("win_out").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData((ts(1, 10), "click", 1.0), (ts(1, 20), "click", 2.0), (ts(1, 30), "view", 5.0))
    q.processAllAvailable()
    input.addData((ts(3, 0), "click", 1.0)) // watermark passes hour 1 -> emit
    q.processAllAvailable()
    input.addData((ts(5, 0), "click", 1.0)) // and hour 3
    q.processAllAvailable()
    val out = spark.table("win_out").collect()
    q.stop()
    val hour1Click = out.find(r => r.getStruct(0).getTimestamp(0).toString.startsWith("2024-01-01 01") &&
      r.getString(1) == "click")
    assert(hour1Click.isDefined && hour1Click.get.getLong(2) == 2L)
  }

  test("streaming dedup within watermark drops in-flight duplicates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val deduped = graft.streaming.IncrementalStream.dedupWithinWatermark(
      input.toDF().toDF("ts", "k"), Seq("k"), "ts", "10 minutes")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 01:$m%02d:00")
    input.addData((ts(1), "a"), (ts(2), "a"), (ts(3), "b")) // dup within batch
    q.processAllAvailable()
    input.addData((ts(4), "a")) // dup across batches, within watermark
    q.processAllAvailable()
    val out = spark.table("dedup_out").select("k").as[String].collect().sorted.toSeq
    q.stop()
    assert(out == Seq("a", "b"))
  }

  test("streaming quota admission: per-source cap holds across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val admitted = graft.streaming.IncrementalStream.quotaAdmit(
      input.toDF().toDF("source", "doc_id"), quota = 3)
    val q = admitted.writeStream.outputMode("append").format("memory")
      .queryName("quota_out").start()
    input.addData(("a", 10L), ("a", 11L), ("b", 20L))
    q.processAllAvailable() // a: 2 admitted, b: 1
    input.addData(("a", 13L), ("a", 12L), ("a", 14L), ("b", 21L))
    q.processAllAvailable() // a has room for 1 -> lowest id 12; b admits 21
    val out = spark.table("quota_out").as[(String, Long)].collect().toSet
    q.stop()
    assert(out == Set(("a", 10L), ("a", 11L), ("a", 12L), ("b", 20L), ("b", 21L)),
      s"got $out")
  }

  test("streaming windowed heavy hitters: MG state across batches, watermark flush") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val hh = graft.streaming.IncrementalStream.windowedHeavyHitters(
      input.toDF().toDF("ts", "token"), "token", "ts",
      windowLength = "1 hour", capacity = 16, k = 2,
      watermarkDelay = "0 seconds")
    val q = hh.writeStream.outputMode("append").format("memory")
      .queryName("hh_out").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData((ts(1, 1), "x"), (ts(1, 2), "x"), (ts(1, 3), "y"))
    q.processAllAvailable() // window open: nothing emitted
    assert(spark.table("hh_out").count() == 0)
    input.addData((ts(1, 10), "x"), (ts(1, 11), "z")) // second batch, same window
    q.processAllAvailable()
    input.addData((ts(3, 0), "w")) // watermark passes 02:00 -> flush hour-1 window
    q.processAllAvailable()
    val out = spark.table("hh_out")
      .select("token", "est_count").as[(String, Long)].collect().toSet
    q.stop()
    // capacity > distinct tokens: MG is exact here; top-2 of {x:3, y:1, z:1}
    assert(out == Set(("x", 3L), ("y", 1L)), s"got $out")
  }

  test("stream-stream attribution join matches within horizon only") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Long, String)]
    val events = input.toDF().toDF("ts", "event_id", "user_id", "event_type")
    val joined = graft.streaming.IncrementalStream.attributionJoin(
      events, causeType = "view", effectType = "click",
      horizon = "30 minutes", watermark = "10 minutes")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("attr_out").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData(
      (ts(1, 0), 100L, 1L, "view"),
      (ts(1, 10), 101L, 1L, "click"), // within 30 min of view 100 -> match
      (ts(1, 50), 102L, 1L, "click"), // 50 min after view 100 -> no match
      (ts(1, 5), 200L, 2L, "view"),
      (ts(1, 10), 201L, 3L, "click")) // different user -> no match
    q.processAllAvailable()
    input.addData((ts(4, 0), 999L, 9L, "view")) // advance watermark -> flush
    q.processAllAvailable()
    val out = spark.table("attr_out")
      .select("cause_id", "effect_id").as[(Long, Long)].collect().toSet
    q.stop()
    assert(out == Set((100L, 101L)), s"got $out")
  }

  test("streaming sessions: open session flushed by event-time timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = graft.streaming.StatefulSessionize.sessionsStream(
      input.toDF().toDF("user_id", "ts"), gapMinutes = 30, watermarkDelay = "0 seconds")
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    // user 1's session spans two micro-batches (gap 30 min not exceeded)
    input.addData((1L, ts(10, 0)), (1L, ts(10, 5)))
    q.processAllAvailable()
    input.addData((1L, ts(10, 20)))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() == 0) // still open, nothing emitted

    // user 2 advances the watermark past user 1's last event + gap;
    // user 1 gets NO new events — only the timeout can close the session
    input.addData((2L, ts(12, 0)))
    q.processAllAvailable()
    val out = spark.table("sess_out")
      .as[graft.streaming.StatefulSessionize.SessionSummary].collect()
    q.stop()
    val u1 = out.filter(_.user_id == 1L)
    assert(u1.length == 1, s"expected one flushed session, got ${out.toSeq}")
    assert(u1.head.n_events == 3L)
    assert(u1.head.start_us == ts(10, 0).getTime * 1000L)
    assert(u1.head.end_us == ts(10, 20).getTime * 1000L)
  }

  test("curation operators run unchanged on a stream (map-only: langid, quality, redaction)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    // the text operators are stateless pass-through transforms, so the
    // same code path serves batch and streaming — chained map stages,
    // no joins, no adaptation layer
    val (pred, _) = graft.operators.TextAnalysis.langId(col("text"))
    val curated = graft.operators.TextAnalysis.redactPii(
        graft.operators.TextAnalysis.quality(docs, "text", "doc_id"),
        "text", "doc_id")
      .withColumn("lang_pred", pred)
    val q = curated.writeStream.outputMode("append").format("memory")
      .queryName("curated_out").start()
    input.addData(
      (1L, "the cat and the dog sat on the mat contact bob@x.io now"),
      (2L, "el perro y el gato en la casa"))
    q.processAllAvailable()
    val out = spark.table("curated_out")
      .select("doc_id", "n_emails", "clean_text", "lang_pred")
      .as[(Long, Long, String, String)].collect().sortBy(_._1)
    q.stop()
    assert(out.length == 2)
    assert(out(0)._2 == 1L && out(0)._3.contains("<EMAIL>") && out(0)._4 == "en")
    assert(out(1)._2 == 0L && out(1)._4 == "es")
  }

  test("streaming fuzzy dedup: near-dups of committed corpus and in-batch clusters dropped") {
    import spark.implicits._
    val in = tempDir("fz_in")
    val state = tempDir("fz_state")
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val other = "one two three four five six seven eight nine ten eleven twelve"
    def writeJson(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/$name"),
        rows.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }.mkString("\n"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def drain(ck: String): Unit =
      IncrementalStream.fuzzyDedupIngest(
        spark.readStream.schema(schema).json(in), state, tempDir(ck))
        .awaitTermination()

    writeJson("b1.json", Seq(1L -> base, 2L -> other))
    drain("fz_ck1")
    assert(spark.read.parquet(s"$state/docs").select("doc_id")
      .as[Long].collect().toSet == Set(1L, 2L))

    // 10 near-dups committed doc 1; 11 is fresh; 12 near-dups 11 in-batch
    writeJson("b2.json", Seq(10L -> (base + " nu"),
      11L -> "red orange yellow green blue indigo violet cyan magenta black white gray",
      12L -> "red orange yellow green blue indigo violet cyan magenta black white gray pink"))
    drain("fz_ck2")
    assert(spark.read.parquet(s"$state/docs").select("doc_id")
      .as[Long].collect().toSet == Set(1L, 2L, 11L))
    // the accepted doc's state joined the corpus: a later copy of 11 drops
    writeJson("b3.json", Seq(20L ->
      "red orange yellow green blue indigo violet cyan magenta black white gray maroon"))
    drain("fz_ck3")
    def committedDocs: Set[Long] = {
      val keys = new java.io.File(s"$state/_commits").listFiles.map(_.getName)
        .filterNot(n => n.startsWith(".") || n.startsWith("_"))
      keys.flatMap(k => spark.read.parquet(s"$state/docs/ingest=$k")
        .select("doc_id").as[Long].collect()).toSet
    }
    assert(committedDocs == Set(1L, 2L, 11L))

    // crash simulation: an UNMARKED state partition (no _commits entry)
    // must be invisible — a doc near-dup'ing only the orphan is accepted
    val orphanText = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"
    Seq((90L, orphanText)).toDF("doc_id", "text")
      .write.parquet(s"$state/docs/ingest=99_orphan")
    val (oBands, oSh) = graft.operators.Dedup.minhashState(
      Seq((90L, orphanText)).toDF("doc_id", "text"), "text", "doc_id")
    oBands.write.parquet(s"$state/bands/ingest=99_orphan")
    oSh.select($"doc_id", $"shingle").write.parquet(s"$state/shingles/ingest=99_orphan")
    writeJson("b4.json", Seq(30L -> (orphanText + " extra")))
    drain("fz_ck4")
    assert(committedDocs == Set(1L, 2L, 11L, 30L)) // orphan never matched
  }

  test("fuzzy-state compaction (depth trigger): the three tables fold to " +
    "one retained ingest with a bucketed gate_ids base; matching, the " +
    "K2 gate and replay are value-identical across the fold") {
    import spark.implicits._
    val in = tempDir("fzc_in")
    val state = tempDir("fzc_state")
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def writeJson(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/$name"),
        rows.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }.mkString("\n"))
    def drain(ck: String): Unit =
      IncrementalStream.fuzzyDedupIngest(
          spark.readStream.schema(schema).json(in), state, tempDir(ck),
          compactWhenUncompactedExceeds = 1)
        .awaitTermination()
    writeJson("b1.json", Seq(1L -> base,
      2L -> "one two three four five six seven eight nine ten eleven twelve"))
    drain("fzc_ck1") // 1 uncompacted ingest: under the bound, no fold
    writeJson("b2.json", Seq(11L ->
      "red orange yellow green blue indigo violet cyan magenta black white gray"))
    drain("fzc_ck2") // 2 > 1: the lane folds its own store mid-lease
    val keys = new java.io.File(s"$state/_commits").listFiles.map(_.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_")).toSeq
    assert(keys.length == 1 && keys.head.startsWith("retained_"),
      s"expected one folded ingest, got $keys")
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(
        s"$state/gate_ids/ingest=${keys.head}"))
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("bucket=")),
      "the fold must build the bucketed gate base")
    // post-fold lifecycle: a replayed committed id drops at the (now
    // bucket-pruned) gate, a near-dup of a committed doc drops at the
    // match, a fresh doc admits
    writeJson("b3.json", Seq(11L ->
      "red orange yellow green blue indigo violet cyan magenta black white gray",
      100L -> (base + " nu"),
      101L -> "uno dos tres cuatro cinco seis siete ocho nueve diez once doce"))
    drain("fzc_ck3")
    val docs = new java.io.File(s"$state/_commits").listFiles.map(_.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_"))
      .flatMap(k => spark.read.parquet(s"$state/docs/ingest=$k")
        .select("doc_id").as[Long].collect()).toSet
    assert(docs == Set(1L, 2L, 11L, 101L))
  }

  test("fuzzy ingest: unrelated session caches survive a batch; commit key stable under re-delivery") {
    import spark.implicits._
    val in = tempDir("fz2_in")
    val state = tempDir("fz2_state")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b1.json"),
      Seq(1L -> "alpha beta gamma delta epsilon zeta eta theta",
          2L -> "one two three four five six seven eight")
        .map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }.mkString("\n"))
    // an APPLICATION-owned cache in the same session — per-batch cleanup
    // must be scoped to the operator's own frames, not catalog-wide
    val appCache = spark.range(0, 1000).toDF("n").cache()
    appCache.count()
    assert(appCache.storageLevel.useMemory)
    IncrementalStream.fuzzyDedupIngest(
      spark.readStream.schema(schema).json(in), state, tempDir("fz2_ck1"))
      .awaitTermination()
    assert(appCache.storageLevel.useMemory,
      "batch cleanup evicted an unrelated application cache")
    appCache.unpersist()
    def ingestKeys = new java.io.File(s"$state/_commits").listFiles
      .map(_.getName).filterNot(n => n.startsWith(".") || n.startsWith("_")).toSet
    def stateDirs = new java.io.File(s"$state/docs").listFiles
      .map(_.getName).filter(_.startsWith("ingest=")).toSet
    val keys1 = ingestKeys
    assert(keys1.size == 1 && stateDirs.size == 1)
    // crash-recovery re-delivery: the marker is lost AFTER the state
    // partitions were written (crash between write and mark). The batch
    // re-delivers under a fresh checkpoint; nothing reads the orphan, the
    // deterministic bit_xor content hash reproduces the SAME key, and the
    // orphan directory is overwritten in place — one state partition, not
    // an accreting pile of near-identical orphans
    new java.io.File(s"$state/_commits/${keys1.head}").delete()
    IncrementalStream.fuzzyDedupIngest(
      spark.readStream.schema(schema).json(in), state, tempDir("fz2_ck2"))
      .awaitTermination()
    assert(ingestKeys == keys1)
    assert(stateDirs.size == 1)
    assert(spark.read.parquet(s"$state/docs").select("doc_id")
      .as[Long].collect().toSet == Set(1L, 2L))
  }

  test("streaming decontamination: contaminated docs blocked at ingest, clean docs commit") {
    import spark.implicits._
    val in = tempDir("dc_in")
    val out = tempDir("dc_out")
    val art = tempDir("dc_art")
    // the benchmark ships once: 8-gram artifact persisted up front
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota"
    graft.operators.Decontam.buildBenchArtifact(
      Seq((900L, benchText)).toDF("doc_id", "text"), "text", "doc_id", art, k = 8)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def writeJson(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/$name"),
        rows.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }.mkString("\n"))
    def drain(ck: String): Unit =
      IncrementalStream.decontamIngest(
        spark.readStream.schema(schema).json(in), art, out, tempDir(ck))
        .awaitTermination()
    def committedDocs: Set[Long] = spark.read.parquet(s"$out/docs")
      .select("doc_id").as[Long].collect().toSet

    // batch 1: doc 1 clean, doc 2 contains a bench 8-gram -> blocked
    writeJson("b1.json", Seq(
      1L -> "one two three four five six seven eight nine ten",
      2L -> (benchText + " smuggled")))
    drain("dc_ck1")
    assert(committedDocs == Set(1L))

    // batch 2: doc 1 re-delivered (dropped), doc 3 clean
    writeJson("b2.json", Seq(
      1L -> "one two three four five six seven eight nine ten",
      3L -> "red orange yellow green blue indigo violet cyan magenta"))
    drain("dc_ck2")
    assert(committedDocs == Set(1L, 3L))
  }

  test("file-stream incremental load is idempotent across re-delivery") {
    val in = tempDir("sin")
    val wh = new Warehouse(spark, tempDir("swh"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/a.csv"),
      "nombre,edad,ciudad\nwalter,26,san lucas\nana,23,cali\nluz,30,cali\n")

    val q1 = IncrementalStream.run(spark, wh, in, tempDir("ck1"))
    q1.awaitTermination()
    assert(wh.read("personas_limpias").count() == 2) // ana under-age rejected

    // new file arrives; fresh checkpoint also re-reads a.csv (re-delivery)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b.csv"),
      "nombre,edad,ciudad\nWalter,26,San Lucas\nnuria,44,cali\n")
    val q2 = IncrementalStream.run(spark, wh, in, tempDir("ck2"))
    q2.awaitTermination()

    val fact = wh.read("personas_limpias")
    assert(fact.count() == 3) // walter deduped across delivery + re-delivery
    assert(wh.read("etl_runs").count() >= 2)
  }

  test("streaming sessionize: gap splits in-stream, watermark closes the tail") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val sess = graft.streaming.IncrementalStream.streamingSessionize(
      input.toDF().toDF("ts", "user_id"), gapMin = 30,
      watermarkDelay = "0 seconds")
    val q = sess.writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 1: two events 10 min apart (one session), then a 60-min gap
    // opens a second session IN-STREAM
    input.addData((ts(1, 0), 1L), (ts(1, 10), 1L))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() == 0) // session still open
    input.addData((ts(2, 10), 1L)) // gap 60 min > 30 -> closes session 1
    q.processAllAvailable()
    def rows() = spark.table("sess_out")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
    assert(rows() == Set((1L, ts(1, 0), ts(1, 10), 2L)), rows().toString)
    // a far-future event from ANOTHER user advances the watermark past
    // session 2's timeout -> the open tail closes without a user-1 event
    input.addData((ts(9, 0), 2L))
    q.processAllAvailable()
    input.addData((ts(9, 1), 2L)) // one more batch so the timeout fires
    q.processAllAvailable()
    q.stop()
    assert(rows() == Set(
      (1L, ts(1, 0), ts(1, 10), 2L),
      (1L, ts(2, 10), ts(2, 10), 1L)), rows().toString)
  }

  test("streaming sessionize: late in-watermark event extends the open session backward") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    // watermarkDelay (2h) > gap (30min): a later batch can legally carry
    // an event OLDER than the open session's start — it must merge by
    // extending session_start backward (the batch sessionizer would have
    // sorted it first), not silently inherit the newer start
    val sess = graft.streaming.IncrementalStream.streamingSessionize(
      input.toDF().toDF("ts", "user_id"), gapMin = 30,
      watermarkDelay = "2 hours")
    val q = sess.writeStream.outputMode("append").format("memory")
      .queryName("sess_late_out").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData((ts(3, 0), 1L))
    q.processAllAvailable()
    input.addData((ts(2, 50), 1L)) // late: within watermark, before start
    q.processAllAvailable()
    // far-future other-user events push the watermark past the timeout
    input.addData((ts(10, 0), 2L))
    q.processAllAvailable()
    input.addData((ts(10, 1), 2L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_late_out")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
      .filter(_._1 == 1L).toSet
    assert(rows == Set((1L, ts(2, 50), ts(3, 0), 2L)), rows.toString)
  }

  test("streaming profile + datasheet sketches: per-batch partitions merge to the whole-corpus answer") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val in = tempDir("psk_in")
    val profDir = tempDir("psk_prof")
    val dsDir = tempDir("psk_ds")
    val (ckP, ckD) = (tempDir("psk_ckp"), tempDir("psk_ckd"))
    val cols = Seq("doc_id", "text", "lang", "source")
    val schema = docs.select(cols.map(org.apache.spark.sql.functions.col): _*).schema
    def drain(): Unit = {
      IncrementalStream.profileSketchIngest(
        spark.readStream.schema(schema).parquet(in), cols, profDir, ckP)
        .awaitTermination()
      IncrementalStream.datasheetSketchIngest(
        spark.readStream.schema(schema).parquet(in), "text", "doc_id",
        "lang", "source", dsDir, ckD)
        .awaitTermination()
    }
    // two drops through the SAME checkpoint — each lands its own batch
    // partition; merge-at-read equals the whole-corpus batch answer
    docs.filter($"doc_id" % 2 === 0).select(cols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("append").parquet(in)
    drain()
    docs.filter($"doc_id" % 2 =!= 0).select(cols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("append").parquet(in)
    drain()
    val merged = graft.operators.Profile.mergeSketches(
        spark.read.parquet(profDir))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    val whole = graft.operators.Profile.profile(docs, cols)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    cols.foreach { c =>
      assert(merged(c)._1 == whole(c)._1 && merged(c)._2 == whole(c)._2, c)
      assert(merged(c)._4 == whole(c)._4 && merged(c)._5 == whole(c)._5, c)
      assert(math.abs(merged(c)._3.toDouble - whole(c)._3.toDouble) <=
        math.max(1.0, 0.02 * whole(c)._3), c)
    }
    val ds = graft.operators.CorpusReport.datasheetFromSketches(
        spark.read.parquet(dsDir))
      .as[(String, Double)].collect().toMap
    val dsWhole = graft.operators.CorpusReport.datasheet(docs, "text",
        "doc_id", "lang", "source")
      .as[(String, Double)].collect().toMap
    for (k <- Seq("n_docs", "n_chars_total", "mean_quality", "pii_doc_rate"))
      assert(ds(k) == dsWhole(k), s"$k: ${ds(k)} vs ${dsWhole(k)}")
    // a failed-then-redelivered batch overwrites ITS OWN partition in
    // place: rewriting an existing batch id must not change the merge
    val batchDirs = new java.io.File(profDir).listFiles
      .filter(_.getName.startsWith("batch=")).map(_.getName)
    assert(batchDirs.length == 2, batchDirs.mkString(","))
    graft.operators.Profile.sketch(
        docs.filter($"doc_id" % 2 === 0).select(cols.map(org.apache.spark.sql.functions.col): _*), cols)
      .write.mode("overwrite").parquet(s"$profDir/${batchDirs.min}")
    val again = graft.operators.Profile.mergeSketches(
        spark.read.parquet(profDir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again("doc_id") == whole("doc_id")._1)
  }

  test("sketch store compaction: bounded partitions, merged readout identical, replay contract intact") {
    import spark.implicits._
    import graft.operators.{Profile, SketchStore}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val cols = Seq("doc_id", "lang")
    val colRefs = cols.map(org.apache.spark.sql.functions.col)
    val in = tempDir("skc_in")
    val skDir = tempDir("skc_prof")
    val ck = tempDir("skc_ck")
    def drain(): Unit =
      IncrementalStream.profileSketchIngest(
          spark.readStream.schema(docs.schema).parquet(in), cols, skDir, ck)
        .awaitTermination()
    def drop(m: Int): Unit = {
      docs.filter($"doc_id" % 3 === m).write.mode("append").parquet(in)
      drain()
    }
    def partNames = new java.io.File(skDir).listFiles
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted.toSeq
    // exact statistics (counts, nulls, min/max) compare bit-for-bit;
    // the HLL distinct ESTIMATE is compared within the sketch's own
    // tolerance — the DataSketches union estimator is nesting-sensitive
    // even though the registers union exactly
    def exact = Profile.mergeSketches(SketchStore.read(spark, skDir))
      .drop("n_distinct").collect().map(_.toString).sorted.toSeq
    def distinctOf(c: String) =
      Profile.mergeSketches(SketchStore.read(spark, skDir))
        .filter($"col_name" === c).head().getLong(3)
    drop(0); drop(1); drop(2)
    assert(partNames == Seq("batch=0", "batch=1", "batch=2"))
    val before = exact
    val beforeDistinct = distinctOf("doc_id")
    val (b3, a3) = SketchStore.compact(spark, skDir, Profile.mergeSketchPartials)
    assert((b3, a3) == (3, 2))
    assert(partNames == Seq("batch=2", "batch=c2"))
    assert(exact == before, "compaction must not change any exact readout")
    assert(math.abs(distinctOf("doc_id") - beforeDistinct) <=
      math.max(1.0, 0.02 * beforeDistinct))
    // already bounded: a second compaction is a no-op
    assert(SketchStore.compact(spark, skDir, Profile.mergeSketchPartials) == (2, 2))
    // the replay contract survives: the newest batch id kept its own
    // partition, so a re-delivered batch 2 overwrites in place
    Profile.sketch(docs.filter($"doc_id" % 3 === 2).select(colRefs: _*), cols)
      .write.mode("overwrite").parquet(s"$skDir/batch=2")
    assert(exact == before)
    // a later drop accretes batch=3; compacting again folds the carried
    // partition with the now-old batch 2 and keeps 3 live
    drop(0) // re-ingesting slice 0 under a NEW batch id — new data is new
    assert(partNames == Seq("batch=2", "batch=3", "batch=c2"))
    val (b4, a4) = SketchStore.compact(spark, skDir, Profile.mergeSketchPartials)
    assert((b4, a4) == (3, 2))
    assert(partNames == Seq("batch=3", "batch=c3"))
    val n = Profile.mergeSketches(SketchStore.read(spark, skDir))
      .filter($"col_name" === "doc_id").head().getLong(1)
    assert(n == docs.count() + docs.filter($"doc_id" % 3 === 0).count())
  }

  test("streaming embedding ingest: screen against persisted index, in-batch reps, re-delivery safe") {
    import spark.implicits._
    val all = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val idxDir = tempDir("emb_idx")
    graft.operators.AnnIndex.buildIvf(all.filter($"vec_id" % 5 =!= 0),
      "embedding", "vec_id", idxDir, nlist = 8, iters = 5)
    def indexIds: Set[Long] = spark.read.parquet(s"$idxDir/corpus")
      .select("vec_id").as[Long].collect().toSet
    val corpusIds = indexIds

    val in = tempDir("emb_in")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    // nprobe = nlist: exhaustive screen, so re-delivery invariance also
    // covers rows dropped as in-batch cluster members (see scaladoc)
    def drain(ck: String): Unit =
      IncrementalStream.embeddingDedupIngest(
          spark.readStream.schema(schema).parquet(in), idxDir, tempDir(ck),
          threshold = 0.35, nprobe = 8)
        .awaitTermination()
    // batch-mode replay of the ingest policy — the screen and pair math
    // are independently oracle-verified; this pins the streaming WIRING
    def keptOf(batch: org.apache.spark.sql.DataFrame): Set[Long] = {
      val dup = graft.operators.AnnIndex.screenIvf(spark, idxDir, batch,
          "embedding", "vec_id", 0.35, 8)
        .select("id_a").as[Long].collect().toSet
      val survivors = batch.filter(!$"vec_id".isin(dup.toSeq: _*))
      val reps = graft.operators.Dedup.clusterReps(survivors,
        graft.operators.Dedup.embeddingNearDup(survivors, "embedding", "vec_id",
          0.35, bits = 4, tables = 12, maxBucket = 200), "vec_id")
      reps.filter($"rep_id" === $"vec_id").select("vec_id").as[Long].collect().toSet
    }

    val b1 = all.filter($"vec_id" % 10 === 0).select("vec_id", "embedding")
    val kept1 = keptOf(b1)
    b1.write.mode("append").parquet(in)
    drain("emb_ck1")
    assert(indexIds == corpusIds ++ kept1)
    assert(kept1.nonEmpty && (b1.select("vec_id").as[Long].collect().toSet -- kept1).nonEmpty,
      "fixture should both keep and drop something")

    // re-delivery: a FRESH checkpoint reprocesses every file; the
    // cosine-1 self-match guard must leave the index unchanged
    drain("emb_ck2")
    assert(indexIds == corpusIds ++ kept1)

    // next drop: fixture slice + a copy of an already-committed vector
    // (screens off against the index) + an in-batch duplicate pair
    // (min-id representative wins)
    val committedVec = all.filter($"vec_id" === kept1.min).select("embedding")
      .as[Seq[Float]].head()
    val donor = all.filter($"vec_id" === 15).select("embedding")
      .as[Seq[Float]].head()
    val b2 = all.filter($"vec_id" % 10 === 5).select("vec_id", "embedding")
      .unionByName(Seq((100001L, donor), (100002L, committedVec))
        .toDF("vec_id", "embedding"))
    val kept2 = keptOf(b2)
    assert(!kept2.contains(100001L), "in-batch dup of id 15 must lose to the min id")
    assert(!kept2.contains(100002L), "copy of a committed vector must screen off")
    b2.write.mode("append").parquet(in)
    drain("emb_ck3")
    assert(indexIds == corpusIds ++ kept1 ++ kept2)
  }

  test("streaming embedding ingest, IVFADC family: frozen-model screen/append, re-delivery safe") {
    import spark.implicits._
    val all = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val idxDir = tempDir("emb_adc_idx")
    graft.operators.AnnIndex.buildIvfAdc(all.filter($"vec_id" % 5 =!= 0),
      "embedding", "vec_id", idxDir, nlist = 8, m = 8, ksub = 16, iters = 3)
    def indexIds: Set[Long] = spark.read.parquet(s"$idxDir/corpus")
      .select("vec_id").as[Long].collect().toSet
    val corpusIds = indexIds
    val in = tempDir("emb_adc_in")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    // nprobe = nlist: the screen is exhaustive within the threshold, so
    // re-delivery invariance holds even for rows the first pass dropped
    // as in-batch cluster members (see embeddingDedupIngest scaladoc)
    def drain(ck: String): Unit =
      IncrementalStream.embeddingDedupIngest(
          spark.readStream.schema(schema).parquet(in), idxDir, tempDir(ck),
          threshold = 0.35, nprobe = 8, adc = true)
        .awaitTermination()
    val batch = all.filter($"vec_id" % 5 === 0).select("vec_id", "embedding")
    // batch-mode replay of the policy with the ADC screen
    val dup = graft.operators.AnnIndex.screenIvfAdc(spark, idxDir, batch,
        "embedding", "vec_id", 0.35, 8)
      .select("id_a").as[Long].collect().toSet
    val survivors = batch.filter(!$"vec_id".isin(dup.toSeq: _*))
    val reps = graft.operators.Dedup.clusterReps(survivors,
      graft.operators.Dedup.embeddingNearDup(survivors, "embedding", "vec_id",
        0.35, bits = 4, tables = 12, maxBucket = 200), "vec_id")
    val kept = reps.filter($"rep_id" === $"vec_id").select("vec_id")
      .as[Long].collect().toSet
    // one file -> one micro-batch: the replay models single-batch
    // semantics (cross-micro-batch cluster splits admit the first
    // arrival, not necessarily the min id - documented in the operator)
    batch.coalesce(1).write.mode("append").parquet(in)
    drain("emb_adc_ck1")
    assert(indexIds == corpusIds ++ kept)
    // appended rows carry codes under the frozen model
    assert(spark.read.parquet(s"$idxDir/corpus")
      .filter(org.apache.spark.sql.functions.col("codes").isNull).count() == 0)
    // re-delivery: fresh checkpoint replays everything; index unchanged
    drain("emb_adc_ck2")
    assert(indexIds == corpusIds ++ kept)
  }

  test("streaming text dedup: raw docs screen through the hashEmbed bridge, re-delivery safe") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val corpus = docs.filter($"doc_id" % 2 === 0)
    val idxDir = tempDir("txt_idx")
    graft.operators.AnnIndex.buildIvf(
      graft.operators.Similarity.hashEmbed(corpus, "text", "doc_id", 64, "td"),
      "embedding", "doc_id", idxDir, nlist = 8, iters = 3)
    def indexIds: Set[Long] = spark.read.parquet(s"$idxDir/corpus")
      .select("doc_id").as[Long].collect().toSet
    val corpusIds = indexIds

    val in = tempDir("txt_in")
    val schema = docs.schema
    def drain(ck: String): Unit =
      IncrementalStream.textDedupIngest(
          spark.readStream.schema(schema).parquet(in), idxDir, tempDir(ck),
          dim = 64, salt = "td", threshold = 0.9, nprobe = 2)
        .awaitTermination()

    // batch: a verbatim copy of a committed doc's text (new id — the
    // EXACT dup a real crawl re-collects), one fresh doc, and an
    // in-batch identical pair
    val committedText = corpus.filter($"doc_id" === 0).select("text")
      .as[String].head()
    val fresh = docs.filter($"doc_id" === 1).select("text").as[String].head()
    Seq((9001L, committedText), (9002L, fresh + " unseen suffix tokens"),
        (9003L, fresh + " other tail entirely"), (9004L, fresh + " unseen suffix tokens"))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    drain("txt_ck1")
    val after1 = indexIds
    // 9001 screened off (cosine 1 vs committed doc 0); 9002/9003 are
    // near-identical texts -> the in-batch cluster keeps the min id
    assert(!after1.contains(9001L), "verbatim copy must screen off")
    assert(after1.contains(9002L))
    assert(!after1.contains(9004L), "in-batch identical text loses to the min id")
    assert((after1 -- corpusIds).subsetOf(Set(9002L, 9003L)))
    // full re-delivery (fresh checkpoint): the index must not change —
    // identical text hashes to the identical vector and self-matches
    drain("txt_ck2")
    assert(indexIds == after1)
  }

  test("streaming sessionize: late event more than a gap before the start closes separately") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    // watermarkDelay (4h) > gap (30min): a late in-watermark event can
    // predate the open session's start by MORE than the gap. The batch
    // sessionizer would emit it as its own earlier session — merging it
    // backward would weld two sessions across a 2-hour silence. Two late
    // stragglers within a gap of each other must form ONE late session.
    val sess = graft.streaming.IncrementalStream.streamingSessionize(
      input.toDF().toDF("ts", "user_id"), gapMin = 30,
      watermarkDelay = "4 hours")
    val q = sess.writeStream.outputMode("append").format("memory")
      .queryName("sess_straggler_out").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData((ts(3, 0), 1L))
    q.processAllAvailable()
    // both 1:00 and 1:10 are in-watermark but > gap before the 3:00 start
    input.addData((ts(1, 0), 1L), (ts(1, 10), 1L))
    q.processAllAvailable()
    // the straggler session closes at batch end, before any timeout
    def rows() = spark.table("sess_straggler_out")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
      .filter(_._1 == 1L).toSet
    assert(rows() == Set((1L, ts(1, 0), ts(1, 10), 2L)), rows().toString)
    // far-future other-user events close the open 3:00 session by timeout
    input.addData((ts(12, 0), 2L))
    q.processAllAvailable()
    input.addData((ts(12, 1), 2L))
    q.processAllAvailable()
    q.stop()
    // batch parity: separate (1:00,1:10) and (3:00,3:00) sessions —
    // exactly what Funnel.sessionize would emit for this event set
    assert(rows() == Set(
      (1L, ts(1, 0), ts(1, 10), 2L),
      (1L, ts(3, 0), ts(3, 0), 1L)), rows().toString)
  }

  test("media screening ingest: silent/clipped/corrupt rows route to reject; replay idempotent") {
    import graft.operators.Multimodal
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def pcm(samples: Seq[Int], rate: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + samples.length * 2).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      b.putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      b.put("data".getBytes).putInt(samples.length * 2)
      samples.foreach(v => b.putShort(v.toShort))
      b.array()
    }
    val good = Multimodal.synthesizeMedia(
      Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .filter(col("doc_id") < 6), "text", "doc_id")
    val y4m = Multimodal.Codec.synthY4m("video payload text".getBytes, 50L)
    val bad = Seq(
      (50L, y4m, "video/y4m", y4m.length.toLong),                 // VALID video
      (100L, Array.fill[Byte](64)(9), "audio/wav", 64L),          // corrupt
      (101L, pcm(Seq.fill(64)(0), 8000), "audio/wav", 172L),      // silent
      (102L, pcm(Seq.tabulate(64)(i => if (i % 2 == 0) 32767 else -32767),
        8000), "audio/wav", 172L))                                // clipped
    val badDf = spark.createDataFrame(
      spark.sparkContext.parallelize(bad.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3, r._4))),
      Multimodal.mediaSchema)
    val in = tempDir("media_in")
    good.unionByName(badDf).write.mode("append").parquet(in)
    val (acc, rej) = (tempDir("media_acc"), tempDir("media_rej"))
    def drain(ck: String): Unit =
      graft.streaming.IncrementalStream.mediaScreenIngest(
          spark.readStream.schema(Multimodal.mediaSchema).parquet(in),
          acc, rej, tempDir(ck))
        .awaitTermination()
    drain("media_ck1")
    val accepted = spark.read.parquet(acc).select("doc_id")
      .as[Long].collect().toSet
    val rejected = spark.read.parquet(rej).select("doc_id", "reason")
      .as[(Long, String)].collect().toMap
    assert(rejected == Map(100L -> "undecodable", 101L -> "silence",
      102L -> "clipped"), rejected.toString)
    // valid video decodes and is ACCEPTED (the codec's y4m case)
    assert(accepted == (0L until 6L).toSet + 50L, accepted.toString)
    // full re-delivery under a fresh checkpoint: same batch ids, same
    // partitions overwritten in place — both sides unchanged
    drain("media_ck2")
    assert(spark.read.parquet(acc).select("doc_id").as[Long].collect().toSet
      == accepted)
    assert(spark.read.parquet(rej).count() == 3)
  }

  test("streaming sessionize: late chain merges when a later event backward-extends the start into gap range") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val sess = graft.streaming.IncrementalStream.streamingSessionize(
      input.toDF().toDF("ts", "user_id"), gapMin = 30,
      watermarkDelay = "4 hours")
    val q = sess.writeStream.outputMode("append").format("memory")
      .queryName("sess_backext_out").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData((ts(3, 0), 1L))
    q.processAllAvailable()
    // 2:20 is > gap before the 3:00 start AT THE MOMENT IT IS PROCESSED
    // (routes to the late chain), but 2:40 then folds in and backward-
    // extends the start to 2:40 — now 2:40 − 2:20 ≤ gap, so the batch
    // sessionizer would chain all three into ONE session (2:20→2:40→3:00,
    // consecutive gaps of 20 min). The late chain must merge at batch
    // end, not close as its own session.
    input.addData((ts(2, 20), 1L), (ts(2, 40), 1L))
    q.processAllAvailable()
    def rows() = spark.table("sess_backext_out")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
      .filter(_._1 == 1L).toSet
    assert(rows().isEmpty, s"nothing closes mid-chain: ${rows()}")
    // far-future other-user events advance the watermark past the timeout
    input.addData((ts(12, 0), 2L))
    q.processAllAvailable()
    input.addData((ts(12, 1), 2L))
    q.processAllAvailable()
    q.stop()
    assert(rows() == Set((1L, ts(2, 20), ts(3, 0), 3L)), rows().toString)
  }

  test("in-lifecycle sketch compaction: a 50-batch stream stays bounded at " +
    "compactEvery+1 partitions and the merged readout equals the batch answer") {
    import spark.implicits._
    import graft.operators.{Profile, SketchStore}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang").localCheckpoint(true)
    val cols = Seq("doc_id", "lang")
    val in = tempDir("mnt_in")
    val skDir = tempDir("mnt_prof")
    val ck = tempDir("mnt_ck")
    val every = 5
    def partNames = new java.io.File(skDir).listFiles
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted.toSeq
    var maxParts = 0
    (0 until 50).foreach { i =>
      docs.filter($"doc_id" % 50 === i).write.mode("append").parquet(in)
      IncrementalStream.profileSketchIngest(
          spark.readStream.schema(docs.schema).parquet(in), cols, skDir, ck,
          compactEvery = every)
        .awaitTermination()
      maxParts = math.max(maxParts, partNames.length)
    }
    // the store NEVER grows past interval+1 live partitions at any
    // stream age (without the hook it would sit at 50 here)
    assert(maxParts <= every + 1, s"saw $maxParts partitions")
    assert(partNames.length <= every + 1)
    // exact readouts are unchanged by the folds: the merged profile of
    // the compacted store equals the one-shot batch profile
    val merged = Profile.mergeSketches(SketchStore.read(spark, skDir))
      .select("col_name", "n_rows", "n_nulls", "min_val", "max_val")
      .collect().map(_.toString).sorted.toSeq
    val whole = Profile.profile(docs, cols)
      .select("col_name", "n_rows", "n_nulls", "min_val", "max_val")
      .collect().map(_.toString).sorted.toSeq
    assert(merged == whole)
  }

  test("streaming media dedup: perceptual screen against the committed " +
    "store, in-batch doc reps, re-delivery safe, undecodable dropped") {
    import spark.implicits._
    import graft.operators.Multimodal
    import Multimodal.Codec
    import org.apache.spark.sql.Row
    val in = tempDir("md_in")
    val store = tempDir("md_store")
    val ck = tempDir("md_ck")
    def mediaDf(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    def wav(id: Long, text: String) = {
      val b = Codec.synthWav(text.getBytes("UTF-8"), id)
      Row(id, b, "audio/wav", b.length.toLong)
    }
    def bmp(id: Long, text: String) = {
      val b = Codec.synthBmp(text.getBytes("UTF-8"), id)
      Row(id, b, "image/bmp", b.length.toLong)
    }
    def drain(): Unit =
      IncrementalStream.mediaDedupIngest(
          spark.readStream.schema(Multimodal.mediaSchema).parquet(in),
          store, ck, compactEvery = 1)
        .awaitTermination()
    def storedDocs: Set[Long] = graft.operators.MediaHashStore.read(spark, store)
      .select("doc_id").distinct().as[Long].collect().toSet
    val (tA, tC) = ("picture content for the first committed image frame",
      "spoken words for the first committed audio clip here")
    mediaDf(Seq(bmp(2L, tA), bmp(4L, "a wholly different second picture"),
      wav(1L, tC))).write.mode("append").parquet(in)
    drain()
    assert(storedDocs == Set(1L, 2L, 4L))
    // batch 2: a 2x upscaled re-encode of image 2 (new id 100), a
    // rate-re-encoded copy of clip 1 (id 103 — same text, other rate
    // class), TWO upscaled copies of one brand-new image (200/201 —
    // in-batch cluster, min id wins), one undecodable blob (999)
    val newPic = "an entirely new image arriving in the second batch!"
    val up = Codec.resizeBmp(Codec.synthBmp(tA.getBytes("UTF-8"), 2L),
      (4 + tA.length % 29) * 2, (4 + 2 % 13).toInt * 2).get
    val newB0 = Codec.synthBmp(newPic.getBytes("UTF-8"), 200L)
    val newUp = Codec.resizeBmp(newB0,
      (4 + newPic.length % 29) * 2, (4 + 200 % 13).toInt * 2).get
    mediaDf(Seq(
      Row(100L, up, "image/bmp", up.length.toLong),
      wav(103L, tC), // 103 % 5 != 1 % 5: different rate, same samples
      Row(200L, newB0, "image/bmp", newB0.length.toLong),
      Row(201L, newUp, "image/bmp", newUp.length.toLong),
      Row(999L, Array.fill[Byte](16)(9), "image/bmp", 16L)
    )).write.mode("append").parquet(in)
    drain()
    // copies of committed media dropped; the new image admitted ONCE
    // under its min id; the undecodable blob has no signature -> dropped
    assert(storedDocs == Set(1L, 2L, 4L, 200L))
    // re-delivery (fresh checkpoint, same store): every batch-2 unit now
    // matches a committed copy at distance 0 — the store must not grow
    val ck2 = tempDir("md_ck2")
    IncrementalStream.mediaDedupIngest(
        spark.readStream.schema(Multimodal.mediaSchema).parquet(in),
        store, ck2)
      .awaitTermination()
    assert(storedDocs == Set(1L, 2L, 4L, 200L))
    // the store holds one flat row per unit (images/audio: one frame
    // each here), and the Hamming bound is a free per-screen parameter
    // (nothing is frozen on disk — banding happens at scan time)
    import graft.operators.MediaHashStore
    val units = MediaHashStore.read(spark, store)
    assert(units.count() == units.select("fid").distinct().count())
    assert(units.select("doc_id").distinct().as[Long].collect().toSet ==
      Set(1L, 2L, 4L, 200L))
    // a self-screen of committed units matches themselves at 0, at any bound
    val self = MediaHashStore.screenUnits(spark, store,
      units.select($"fid", $"grid", $"dhash"), "fid", maxHamming = 5)
    assert(self.filter($"id_a" === $"id_b" && $"hamming" === 0).count() == 4)
    // compaction folds append small files and changes no readout
    val beforeRows = units.orderBy("fid").collect().toSeq
    val (cb, ca) = MediaHashStore.compact(spark, store)
    assert(ca <= cb)
    assert(MediaHashStore.read(spark, store).orderBy("fid")
      .collect().toSeq == beforeRows)
  }

  test("in-lifecycle ANN maintenance: drift retrain fires between drains; " +
    "rows and ids survive compaction + rebuild") {
    import spark.implicits._
    import graft.operators.AnnIndex
    val all = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .localCheckpoint(true)
    val base = all.filter($"vec_id" % 3 === 0)
    val idxDir = tempDir("mnt_idx")
    AnnIndex.buildIvf(base, "embedding", "vec_id", idxDir, nlist = 4, iters = 3)
    val n0 = spark.read.parquet(s"$idxDir/cell_stats")
      .agg(org.apache.spark.sql.functions.sum("n_built")).head().getLong(0)
    // skewed traffic: jittered copies of the HOTTEST cell's own vectors
    // (multiplier 1.0..1.6 per component — direction moves a few degrees,
    // so the row still routes near its source cell but stays below the
    // screen threshold) — that one cell's occupancy balloons and routing
    // drift grows with every append. Negating or scaling the corpus
    // would NOT drift it: the fixture clusters are direction-symmetric
    // and cosine routing is scale-invariant.
    import org.apache.spark.sql.functions.{pmod, transform, lit}
    val in = tempDir("mnt_vec_in")
    val ck = tempDir("mnt_vec_ck")
    val hotCell = spark.read.parquet(s"$idxDir/cell_stats")
      .orderBy($"n_built".desc).head().getLong(0)
    val hotRows = spark.read.parquet(s"$idxDir/corpus")
      .filter($"cell_id" === hotCell)
      .select("vec_id", "embedding").localCheckpoint(true)
    def jittered(b: Int) = hotRows.select(
      ($"vec_id" + 100000L * (b + 1)).as("vec_id"),
      transform($"embedding", (x, i) =>
        x * (lit(1.0f) + pmod($"vec_id" * 7L + i.cast("long") * 13L
          + lit(b.toLong), lit(7L)).cast("float") * lit(0.1f))).as("embedding"))
    (0 until 3).foreach { b =>
      jittered(b).write.mode("append").parquet(in)
      IncrementalStream.embeddingDedupIngest(
          spark.readStream.schema(hotRows.schema).parquet(in), idxDir, ck,
          threshold = 0.9995,
          maintenance = Some(IncrementalStream.IndexMaintenance(
            maintainEvery = 2, tvdThreshold = 0.05, retrainNlist = 4)))
        .awaitTermination()
    }
    // the stream really grew the corpus (otherwise drift is vacuous)
    assert(spark.read.parquet(s"$idxDir/corpus").count() > n0)
    // the retrain re-snapshotted cell_stats from the grown corpus —
    // proof the TVD trigger fired inside the lifecycle hook
    val n1 = spark.read.parquet(s"$idxDir/cell_stats")
      .agg(org.apache.spark.sql.functions.sum("n_built")).head().getLong(0)
    assert(n1 > n0, s"retrain did not fire (cell_stats still $n1 rows from build)")
    // and the store survived compact + rebuild intact: no row loss, no
    // duplication, every originally-built id still present
    val corpus = spark.read.parquet(s"$idxDir/corpus")
    val ids = corpus.select("vec_id").as[Long].collect()
    assert(ids.length == ids.distinct.length)
    val baseIds = base.select("vec_id").as[Long].collect().toSet
    assert(baseIds.subsetOf(ids.toSet))
    // post-retrain the routing snapshot is fresh: TVD back under the
    // trigger for the rows present at maintenance time
    val tvd = AnnIndex.routingDrift(spark, idxDir)
      .agg(org.apache.spark.sql.functions.sum("abs_diff") / 2).head().getDouble(0)
    assert(tvd <= 0.05, s"TVD $tvd still above the retrain threshold")
  }

  test("sketch ingest heals a compaction crashed mid-swap BEFORE the " +
    "per-batch write — history survives a replayed batch + later compact") {
    import spark.implicits._
    import graft.operators.{Profile, SketchStore}
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val in = tempDir("heal_in")
    val skDir = tempDir("heal_prof")
    val ck = tempDir("heal_ck")
    def drain(): Unit =
      IncrementalStream.profileSketchIngest(
          spark.readStream.schema(docs.schema).parquet(in),
          Seq("doc_id", "lang"), skDir, ck, compactEvery = 2)
        .awaitTermination()
    docs.filter($"doc_id" % 2 === 0).write.mode("append").parquet(in)
    drain()
    docs.filter($"doc_id" % 2 =!= 0).write.mode("append").parquet(in)
    // crash simulation: SketchStore.compact renames dir -> dir__old and
    // dies before renaming the compacted temp in — the state the r9
    // advice identified: a replayed batch writing batch=<id> into the
    // missing dir would recreate it with only its own partition and the
    // next compact's delete(__old) would erase all prior history
    val fs = new org.apache.hadoop.fs.Path(skDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(skDir),
      new org.apache.hadoop.fs.Path(skDir + "__old")))
    drain() // batch 1 ingests; its write must heal FIRST
    // batchId 1 ends on compactEvery = 2? no (1 % 2 != 0) — both batch
    // partitions must exist, with batch 0's sketch intact
    val n = Profile.mergeSketches(SketchStore.read(spark, skDir))
      .filter(col("col_name") === "doc_id").head().getLong(1)
    assert(n == docs.count(), s"pre-crash history lost: merged n=$n")
    // and a compact AFTER the heal keeps the full history too
    SketchStore.compact(spark, skDir, Profile.mergeSketchPartials)
    val n2 = Profile.mergeSketches(SketchStore.read(spark, skDir))
      .filter(col("col_name") === "doc_id").head().getLong(1)
    assert(n2 == docs.count())
  }

  test("media store: staged append commits whole batches (stage debris " +
    "invisible); oversized screen batches fall back to the shuffle regime " +
    "with identical results") {
    import spark.implicits._
    import graft.operators.{Dedup, MediaHashStore, Multimodal}
    import org.apache.spark.sql.functions.col
    val store = tempDir("staged_store")
    def unitHashes(ids: Seq[Long], salt: String) = {
      val media = Multimodal.synthesizeMedia(
        ids.map(i => (i, s"$salt body of synthetic picture number $i with enough bytes"))
          .toDF("doc_id", "text"), "text", "doc_id")
      Multimodal.visualHashes(media).filter(col("dhash").isNotNull)
        .select(col("doc_id").as("fid"), col("doc_id"),
          col("frame_idx"), col("grid"), col("dhash"))
    }
    MediaHashStore.append(spark, store, unitHashes(Seq(2L, 4L, 6L), "first"))
    assert(MediaHashStore.read(spark, store).count() == 3)
    // a crashed append's stage debris (written but never renamed in)
    // must NOT surface as committed rows
    unitHashes(Seq(8L, 10L), "debris").write.mode("overwrite")
      .parquet(s"$store/hashes__stage")
    assert(MediaHashStore.read(spark, store)
      .select("fid").as[Long].collect().toSet == Set(2L, 4L, 6L))
    // the next append clears the debris and commits its own batch whole
    MediaHashStore.append(spark, store, unitHashes(Seq(12L), "second"))
    assert(MediaHashStore.read(spark, store)
      .select("fid").as[Long].collect().toSet == Set(2L, 4L, 6L, 12L))
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$store/hashes__stage")))
    // regime fallback (r9 advice): a feasibility cap of 0 makes every
    // screen batch "too big" and takes the shuffle join — results must
    // be identical to the broadcast regime's
    val probe = unitHashes(Seq(2L, 4L), "first")
      .unionByName(unitHashes(Seq(12L), "second"))
      .unionByName(unitHashes(Seq(98L), "unrelated wholly new"))
      .withColumn("fid", col("fid") + 1000L)
    val viaBroadcast = MediaHashStore.screenUnits(spark, store, probe, "fid")
      .orderBy("id_a", "id_b").collect().toSeq
    assert(viaBroadcast.nonEmpty) // 2/4/12 self-match their committed copies
    val viaShuffle = MediaHashStore.screenUnits(spark, store, probe, "fid",
        maxBroadcastBytes = 0L)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(viaShuffle == viaBroadcast)
    // compaction read-back stays whole under the subdir layout too
    val (cb, ca) = MediaHashStore.compact(spark, store)
    assert(ca <= cb)
    assert(MediaHashStore.read(spark, store).count() == 4)
  }

  test("streaming serving ingest: drains grow the hybrid stack; split " +
    "drains serve bit-identical to a one-shot build at nprobe = nlist; " +
    "fresh-checkpoint replay touches nothing; compaction folds the " +
    "batch files and preserves the serve") {
    import spark.implicits._
    import graft.pipeline.RetrievePipeline
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .localCheckpoint(true)
    val grown = tempDir("si_grown")
    RetrievePipeline.build(docs.filter(col("doc_id") < 250), "text",
      "doc_id", grown, chunkTokens = 32, stride = 32, dim = 32,
      salt = "rp", nlist = 4, iters = 3)
    val in = tempDir("si_in")
    val ck = tempDir("si_ck")
    val wh = new graft.warehouse.Warehouse(spark, tempDir("si_wh"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def drain(c: String = ck): Unit =
      IncrementalStream.servingIngest(
          spark.readStream.schema(schema).parquet(in), grown, c,
          warehouse = Some(wh), auditTable = Some("grow_audit"))
        .awaitTermination()
    docs.filter(col("doc_id") >= 250 && col("doc_id") < 375)
      .select("doc_id", "text").write.mode("append").parquet(in)
    drain()
    docs.filter(col("doc_id") >= 375).select("doc_id", "text")
      .write.mode("append").parquet(in)
    drain()
    // ≡ a one-shot build over everything, through BOTH legs (nprobe =
    // nlist — exhaustive probes make serving centroid-independent)
    val oneShot = tempDir("si_oneshot")
    RetrievePipeline.build(docs, "text", "doc_id", oneShot,
      chunkTokens = 32, stride = 32, dim = 32, salt = "rp", nlist = 4,
      iters = 3)
    val sampleChunk = graft.operators.CorpusOps.chunkDocs(
        docs, "doc_id", "text", 32, 32)
      .filter(col("chunk_idx") === 0 && col("doc_id") === 300)
      .select(col("chunk_text")).as[String].head()
    val queries = Seq((1L, sampleChunk)).toDF("query_id", "text")
    def serve(d: String): Seq[String] =
      RetrievePipeline.query(spark, d, queries, k = 5, nprobe = 4)
        .collect().map(_.toString).sorted.toSeq
    val split = serve(grown)
    assert(split == serve(oneShot))
    assert(RetrievePipeline.query(spark, grown, queries, k = 5, nprobe = 4)
      .filter(col("rank") === 1).head().getLong(3) == 300L,
      "the streamed-in doc must serve at rank 1 for its own chunk text")
    // fresh-checkpoint FULL replay: the doc gate admits nothing and no
    // artifact byte moves
    def snapshot(): Map[String, Long] = {
      val fs = new org.apache.hadoop.fs.Path(grown)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(grown), true)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) {
        val f = it.next()
        b += f.getPath.toString -> (f.getLen + f.getModificationTime)
      }
      b.result()
    }
    // GROWTH AUDIT (the reference's K5 per-run discipline on the growth
    // lane): one row per (run, batch, stage) with offered/admitted —
    // and the admitted chunk counts RECONCILE with what actually sits
    // in the staged batch dirs on disk
    val audit0 = wh.read("grow_audit").localCheckpoint(true)
    assert(audit0.count() == 6, // 2 drained batches × 3 append stages
      audit0.collect().mkString("\n"))
    assert(audit0.filter(col("store").endsWith(":chunks")).count() == 2)
    val auditedChunks = audit0.filter(col("store").endsWith(":chunks"))
      .agg(org.apache.spark.sql.functions.sum("admitted_count"))
      .head().getLong(0)
    val diskBatchDirs = new java.io.File(s"$grown/chunks").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("b_"))
      .map(_.toString)
    assert(auditedChunks ==
      spark.read.parquet(diskBatchDirs.toIndexedSeq: _*).count(),
      "audited admitted chunks must equal the staged batch dirs' rows")
    // offered = the batch's doc count (125 per drain), on every stage row
    assert(audit0.filter(col("offered_count") =!= 125L).count() == 0)
    // gate-trade columns (r12 verdict #3): mode, #parts the guard probed
    // at drain time, fpp — gate_parts × gate_fpp is the realized silent-
    // drop exposure an operator bounds after the fact; exact mode
    // records fpp 0.0 (no drop risk)
    assert(audit0.filter(col("gate_mode") =!= "exact").count() == 0)
    assert(audit0.filter(col("gate_fpp") =!= 0.0).count() == 0)
    assert(audit0.select("batch_id", "gate_parts").distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
      == Set((0L, 1), (1L, 2)), // base part, then base + batch 0's dir
      audit0.collect().mkString("\n"))
    val before = snapshot()
    drain(tempDir("si_ck2"))
    assert(snapshot() == before,
      "a replayed content feed must not touch the stack")
    // the replay run records honest no-op rows (admitted 0) under its
    // own run key; the original run's rows survive untouched
    val audit1 = wh.read("grow_audit").localCheckpoint(true)
    assert(audit1.count() == 9)
    assert(audit1.filter(col("admitted_count") === 0L).count() == 3)
    // a same-checkpoint re-drain fires no batch: nothing appends
    drain()
    assert(wh.read("grow_audit").count() == 9)
    // maintenance: compaction folds the per-batch chunk subdirs back
    // into the flat range layout, serve unchanged
    assert(new java.io.File(s"$grown/chunks").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("b_")))
    RetrievePipeline.compact(spark, grown)
    assert(!new java.io.File(s"$grown/chunks").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("b_")))
    assert(serve(grown) == split, "compaction must not change the serve")
  }

  test("streaming bm25 ingest: split drains serve bit-identical to the " +
    "one-shot operator; fresh-checkpoint replay admits nothing; in-" +
    "lifecycle compaction and a mid-swap crash heal preserve the serve") {
    import spark.implicits._
    import graft.operators.Retrieval
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(150).localCheckpoint(true)
    val in = tempDir("bi_in")
    val ck = tempDir("bi_ck")
    val idx = s"${tempDir("bi_idx")}/idx"
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    // compactEvery = 2: the third drain (batchId 2) folds the per-append
    // partitions inside its own foreachBatch — the single-writer window
    val wh = new graft.warehouse.Warehouse(spark, tempDir("bi_wh"))
    def drain(c: String = ck): Unit =
      IncrementalStream.bm25Ingest(
          spark.readStream.schema(schema).parquet(in), idx, c,
          compactEvery = 2,
          warehouse = Some(wh), auditTable = Some("bm25_grow_audit"))
        .awaitTermination()
    val terms = Seq((1L, "the"), (1L, "data"), (2L, "of"), (2L, "a"))
      .toDF("query_id", "term")
    def serve(): Seq[(Long, Long, Long, Double)] =
      Retrieval.bm25TopKFromIncremental(spark, idx, terms, 10)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    def ingests(): Int = {
      val files = new java.io.File(s"$idx/_commits").listFiles()
      if (files == null) 0
      else files.map(_.getName)
        .count(n => !n.startsWith(".") && !n.startsWith("_"))
    }
    docs.filter(col("doc_id") < 50).select("doc_id", "text")
      .write.mode("append").parquet(in)
    drain() // batch 0
    docs.filter(col("doc_id") >= 50 && col("doc_id") < 100)
      .select("doc_id", "text").write.mode("append").parquet(in)
    drain() // batch 1
    assert(ingests() == 2)
    val split = serve()
    // split ingests ≡ the one-shot whole-corpus operator, bit for bit
    val oneShot = Retrieval.bm25TopK(docs.filter(col("doc_id") < 100),
        "text", "doc_id", terms, 10)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(split == oneShot)
    // growth audit: one row per drained batch, admitted reconciling
    // with the docs actually committed
    val grow = wh.read("bm25_grow_audit").localCheckpoint(true)
    assert(grow.count() == 2)
    assert(grow.select(org.apache.spark.sql.functions
      .sum("admitted_count")).head().getLong(0) == 100L)
    assert(grow.filter(col("store") === s"bm25:$idx").count() == 2)
    // gate-trade columns (r12 verdict #3): fresh index probes 0 parts,
    // the second drain probes batch 0's ingest; exact mode → fpp 0.0
    assert(grow.filter(col("gate_mode") =!= "exact").count() == 0)
    assert(grow.filter(col("gate_fpp") =!= 0.0).count() == 0)
    assert(grow.select("batch_id", "gate_parts").distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet == Set((0L, 0), (1L, 1)),
      grow.collect().mkString("\n"))
    // fresh-checkpoint FULL replay: the append's K2 anti-join admits
    // nothing — no new ingest partitions, serve unchanged; the replay
    // run's audit row is an honest admitted=0
    drain(tempDir("bi_ck2"))
    assert(ingests() == 2, "a replayed drain must commit no new ingests")
    assert(serve() == split)
    assert(wh.read("bm25_grow_audit")
      .filter(col("admitted_count") === 0L).count() == 1)
    // crash window: a consolidation that died between its two renames
    // parks the index at __old — the NEXT drain heals it, ingests batch 2
    // and (batchId 2 % compactEvery 2 == 0) compacts in-lifecycle
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(idx),
      new org.apache.hadoop.fs.Path(idx + "__old")))
    docs.filter(col("doc_id") >= 100).select("doc_id", "text")
      .write.mode("append").parquet(in)
    drain() // batch 2: heal, append, compact
    assert(ingests() == 1, "compactEvery must fold the ingest partitions")
    val full = serve()
    val oneShotFull = Retrieval.bm25TopK(docs, "text", "doc_id", terms, 10)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(full == oneShotFull,
      "healed + compacted index must serve the whole corpus bit-identically")
    // and the takedown lane retracts from it (the lifecycle loop closed)
    val victim = full.head._3
    assert(Retrieval.forgetBm25Incremental(spark, idx,
      Seq(victim).toDF("doc_id")) >= 1L)
    assert(!serve().exists(_._3 == victim))
  }

  test("bm25 growth audit in BLOOM mode records the gate's trade — parts " +
    "probed at drain time and the pinned fpp, so realized silent-drop " +
    "exposure is bounded after the fact") {
    import graft.operators.Retrieval
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 60).select("doc_id", "text")
      .localCheckpoint(true)
    val in = tempDir("bb_in")
    val ck = tempDir("bb_ck")
    val idx = s"${tempDir("bb_idx")}/idx"
    val wh = new graft.warehouse.Warehouse(spark, tempDir("bb_wh"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def drain(): Unit =
      IncrementalStream.bm25Ingest(
          spark.readStream.schema(schema).parquet(in), idx, ck,
          idGuard = "bloom",
          warehouse = Some(wh), auditTable = Some("bb_audit"))
        .awaitTermination()
    docs.filter(col("doc_id") < 30).write.mode("append").parquet(in)
    drain() // batch 0: fresh index — the guard probed nothing
    docs.filter(col("doc_id") >= 30).write.mode("append").parquet(in)
    drain() // batch 1: one committed ingest's bloom probed at 1e-4
    val rows = wh.read("bb_audit")
      .select("batch_id", "gate_mode", "gate_parts", "gate_fpp")
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3))).toSet
    assert(rows == Set((0L, "bloom", 0, 0.0), (1L, "bloom", 1, 1e-4)),
      rows.mkString("\n"))
    // the serve reconciles: both drains' docs are in the index
    assert(Retrieval.bm25TopKFromIncremental(spark, idx,
        spark.createDataFrame(Seq((1L, "the"))).toDF("query_id", "term"), 5)
      .count() > 0)
  }

  test("streaming graph ingest: split edge drains label identically to " +
    "one-shot CC; the audit separates growth from merges; replay admits " +
    "nothing; in-lifecycle compaction folds the remap chain") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val in = tempDir("gi_in")
    val ck = tempDir("gi_ck")
    val store = s"${tempDir("gi_store")}/store"
    val wh = new graft.warehouse.Warehouse(spark, tempDir("gi_wh"))
    val schema = StructType(Seq(StructField("a", LongType),
      StructField("b", LongType)))
    def drain(c: String = ck): Unit =
      IncrementalStream.graphIngest(
          spark.readStream.schema(schema).parquet(in), store, c,
          compactEvery = 2,
          warehouse = Some(wh), auditTable = Some("graph_audit"))
        .awaitTermination()
    def labels(): Seq[(Long, Long)] =
      graft.operators.GraphStore.labels(spark, store)
        .orderBy("node").as[(Long, Long)].collect().toSeq
    Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
      .write.mode("append").parquet(in)
    drain() // batch 0: two components
    Seq((3L, 10L), (20L, 21L)).toDF("a", "b")
      .write.mode("append").parquet(in)
    drain() // batch 1: bridge merges them, one fresh chain
    val after = labels()
    assert(after == Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 1L),
      (11L, 1L), (20L, 20L), (21L, 20L)))
    // audit: offered = edges, admitted = first-labeled nodes, merged =
    // committed components fused — the ER growth signal
    val audit = wh.read("graph_audit")
      .select("batch_id", "offered_count", "admitted_count", "merged_count")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(audit == Set((0L, 3L, 5L, 0L), (1L, 2L, 2L, 1L)),
      audit.mkString("\n"))
    // fresh-checkpoint FULL replay: monotone merges make it a natural
    // no-op — nothing admits, nothing merges, labels unchanged
    drain(tempDir("gi_ck2"))
    assert(labels() == after)
    assert(wh.read("graph_audit")
      .filter(col("admitted_count") === 0L && col("merged_count") === 0L)
      .count() == 1, "the replay run records one honest no-op row")
    // third drain (batchId 2 % compactEvery 2 == 0): ingests fold inside
    // the batch's own lease window; resolution survives the fold
    Seq((21L, 11L)).toDF("a", "b").write.mode("append").parquet(in)
    drain()
    assert(labels() == Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 1L),
      (11L, 1L), (20L, 1L), (21L, 1L)))
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$store/_commits"))
      .map(_.getPath.getName)
      .count(n => !n.startsWith(".") && !n.startsWith("_")) == 1,
      "compactEvery must fold the ingests to one")
  }

  test("the depth trigger folds a lane's own store: a graph drain whose " +
    "flat tail outgrows compactWhenUncompactedExceeds compacts mid-drain " +
    "with no compactEvery schedule, bounding the remap chain by policy") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val in = tempDir("gd_in")
    val ck = tempDir("gd_ck")
    val store = s"${tempDir("gd_store")}/store"
    val schema = StructType(Seq(StructField("a", LongType),
      StructField("b", LongType)))
    // four 1-file writes + maxFilesPerTrigger=1 → four micro-batches in
    // ONE drain; each bridges into the previous chain so every batch
    // also grows the remap chain the policy must bound
    Seq(Seq((1L, 2L), (2L, 3L)), Seq((3L, 4L)), Seq((4L, 5L)), Seq((5L, 6L)))
      .foreach(_.toDF("a", "b").coalesce(1).write.mode("append").parquet(in))
    IncrementalStream.graphIngest(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(in),
        store, ck, compactEvery = 0, compactWhenUncompactedExceeds = 2)
      .awaitTermination()
    val labels = graft.operators.GraphStore.labels(spark, store)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(labels == (1L to 6L).map((_, 1L)),
      "split drain ≡ one-shot CC regardless of when the fold fired")
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = fs
      .listStatus(new org.apache.hadoop.fs.Path(s"$store/_commits"))
      .map(_.getPath.getName)
      .filter(n => !n.startsWith(".") && !n.startsWith("_")).toSeq
    assert(commits.length < 4 && commits.exists(_.startsWith("r")),
      s"the depth trigger must have folded mid-drain, got $commits")
    // the policy's bound holds at drain end: flat tail AND remap chain
    // both ≤ the threshold (labels/ingest=i* = flat; remap dirs = chain)
    def dirsOf(t: String) = {
      val p = new org.apache.hadoop.fs.Path(s"$store/$t")
      if (!fs.exists(p)) 0
      else fs.listStatus(p).count(s => commits.contains(
        s.getPath.getName.stripPrefix("ingest=")) &&
        s.getPath.getName.stripPrefix("ingest=").startsWith("i"))
    }
    assert(dirsOf("labels") <= 2, "flat tail must respect the bound")
    assert(dirsOf("remap") <= 2, "remap chain must respect the bound")
  }

  test("streaming span ingest: per-batch probe stats are incremental-exact " +
    "vs the one-shot operator; replay admits nothing and rewrites value-" +
    "identical stats; in-lifecycle compaction") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 150).select("doc_id", "text")
      .localCheckpoint(true)
    val in = tempDir("sp_in")
    val ck = tempDir("sp_ck")
    val store = s"${tempDir("sp_store")}/store"
    val stats = tempDir("sp_stats")
    val wh = new graft.warehouse.Warehouse(spark, tempDir("sp_wh"))
    def drain(c: String = ck): Unit =
      IncrementalStream.spanIngest(
          spark.readStream.schema(StructType(Seq(
            StructField("doc_id", LongType), StructField("text", StringType)
          ))).parquet(in), store, c, k = 8, minDocs = 2,
          statsDir = Some(stats), compactEvery = 2,
          warehouse = Some(wh), auditTable = Some("span_grow_audit"))
        .awaitTermination()
    def ingests(): Int = {
      val files = new java.io.File(s"$store/_commits").listFiles()
      if (files == null) 0
      else files.map(_.getName)
        .count(n => !n.startsWith(".") && !n.startsWith("_"))
    }
    def statsOf(batchId: Long, c: String = ck): Seq[(Long, Long, Long, Long, Double)] =
      spark.read.parquet(
          s"${IncrementalStream.spanStatsRunDir(spark, stats, c)}/batch=$batchId")
        .select("doc_id", "n_tokens", "dup_spans", "dup_tokens", "dup_fraction")
        .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // the one-shot operator over a corpus prefix, restricted to a slice —
    // the incremental contract every batch's stats must hit
    def oneShot(upTo: Long, lo: Long): Seq[(Long, Long, Long, Long, Double)] =
      graft.operators.Dedup.spanStats(docs.filter(col("doc_id") < upTo),
          "text", "doc_id", k = 8, minDocs = 2)
        .filter(col("doc_id") >= lo)
        .select("doc_id", "n_tokens", "dup_spans", "dup_tokens", "dup_fraction")
        .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    docs.filter(col("doc_id") < 50).write.mode("append").parquet(in)
    drain() // batch 0: store empty at probe time → stats = spanStats(A)
    assert(ingests() == 1)
    assert(statsOf(0) == oneShot(50, 0))
    // fresh-checkpoint replay re-fires the same files as its own batch 0:
    // the K2 gate admits nothing, and the replay's stats land under its
    // OWN run directory (a rotated checkpoint's batch 0 must not clobber
    // the prior run's batch-0 trail) — VALUE-identical to the original,
    // because the replayed docs count on the committed side instead of
    // the batch side (the probe's doc-grain union)
    val ck2 = tempDir("sp_ck2")
    drain(ck2)
    assert(ingests() == 1, "a replayed drain must commit no new ingests")
    assert(statsOf(0) == oneShot(50, 0))
    assert(statsOf(0, ck2) == oneShot(50, 0))
    docs.filter(col("doc_id") >= 50 && col("doc_id") < 100)
      .write.mode("append").parquet(in)
    drain() // batch 1: dup counted across committed A ∪ batch B
    assert(ingests() == 2)
    assert(statsOf(1) == oneShot(100, 50))
    docs.filter(col("doc_id") >= 100).write.mode("append").parquet(in)
    drain() // batch 2: stats vs A ∪ B ∪ C, then compactEvery=2 folds
    assert(ingests() == 1, "compactEvery must fold the ingest partitions")
    assert(statsOf(2) == oneShot(150, 100))
    // growth audit: one row per fired batch (3 under ck + 1 replay run),
    // admitted reconciling with the corpus; the replay row is honest 0
    val audit = wh.read("span_grow_audit").localCheckpoint(true)
    assert(audit.count() == 4)
    assert(audit.agg(org.apache.spark.sql.functions.sum("admitted_count"))
      .head().getLong(0) == 150L)
    assert(audit.filter(col("admitted_count") === 0L).count() == 1)
    assert(audit.filter(col("store") === s"span:$store").count() == 4)
  }

  test("streaming span takedown: text-bearing forget lifts duplication, " +
    "replay removes 0 honestly, the retracted doc re-admits") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val span = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    val corpus = Seq((1L, s"a1 a2 $span"), (2L, "c1 c2 c3 c4 c5 c6 c7 c8 c9"))
      .toDF("doc_id", "text")
    val probeDoc = Seq((10L, s"z1 z2 z3 $span")).toDF("doc_id", "text")
    val store = s"${tempDir("srt_store")}/store"
    val in = tempDir("srt_in")
    val ck = tempDir("srt_ck")
    val wh = new graft.warehouse.Warehouse(spark, tempDir("srt_wh"))
    graft.operators.SpanStore.append(spark, store, corpus, "text", "doc_id", k = 8)
    def dupTokens(): Long =
      graft.operators.SpanStore.probe(spark, store, probeDoc,
          "text", "doc_id", k = 8, minDocs = 2)
        .head().getLong(3)
    assert(dupTokens() == 10L) // doc 1's span dups against the probe doc
    def drain(c: String = ck): Unit =
      IncrementalStream.spanRetractionIngest(
          spark.readStream.schema(StructType(Seq(
            StructField("doc_id", LongType), StructField("text", StringType)
          ))).parquet(in), store, c,
          warehouse = Some(wh), auditTable = Some("span_rt_audit"))
        .awaitTermination()
    corpus.filter(col("doc_id") === 1L).write.mode("append").parquet(in)
    drain()
    assert(dupTokens() == 0L, "the takedown must lift the span's dup count")
    val audit0 = wh.read("span_rt_audit").localCheckpoint(true)
    assert(audit0.count() == 1)
    assert(audit0.select("removed_count").head().getLong(0) == 1L)
    // fresh-checkpoint replay: the gate finds nothing committed —
    // removed 0, recorded honestly under the replay's own run
    drain(tempDir("srt_ck2"))
    assert(dupTokens() == 0L)
    val audit1 = wh.read("span_rt_audit").localCheckpoint(true)
    assert(audit1.count() == 2)
    assert(audit1.filter(col("removed_count") === 0L).count() == 1)
    // the forget lifted the K2 veto: doc 1 re-admits and the dup returns
    assert(graft.operators.SpanStore.append(spark, store,
      corpus.filter(col("doc_id") === 1L), "text", "doc_id", k = 8) == 1L)
    assert(dupTokens() == 10L)
  }
}
