package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Pq, Similarity}

/** Persisted IVF index: results must be bit-identical to the in-memory
  * trained path, and probes must prune cell partitions at the scan.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def fixture() = {
    val all = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = all.filter(col("vec_id") < 10)
    (all, qs)
  }

  test("persisted query == in-memory ivfTopKTrained, bit for bit") {
    val (all, qs) = fixture()
    val dir = tempDir("annidx")
    AnnIndex.buildIvf(all, "embedding", "vec_id", dir, nlist = 8, iters = 5)
    val persisted = AnnIndex.queryIvf(spark, dir, qs, "embedding", "vec_id",
        k = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    val inMemory = Similarity.ivfTopKTrained(all, qs, "embedding", "vec_id",
        k = 5, nlist = 8, iters = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(persisted == inMemory)
    assert(persisted.nonEmpty)
  }

  test("bulk query path == broadcast query path, bit for bit, whole corpus as queries") {
    val (all, qs) = fixture()
    val dir = tempDir("annidx8")
    AnnIndex.buildIvf(all, "embedding", "vec_id", dir, nlist = 8, iters = 5)
    // small query set: both paths agree
    val small = AnnIndex.queryIvf(spark, dir, qs, "embedding", "vec_id",
        k = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    val smallBulk = AnnIndex.queryIvfBulk(spark, dir, qs, "embedding", "vec_id",
        k = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(smallBulk == small)
    // the bulk case the broadcast path is NOT for: every corpus vector
    // as a query (self-kNN) — ranks complete and self-matches excluded
    val bulk = AnnIndex.queryIvfBulk(spark, dir, all, "embedding", "vec_id",
        k = 3, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(bulk.map(_._1).distinct.length == all.count())
    assert(bulk.forall(r => r._1 != r._3))
    assert(bulk.groupBy(_._1).values.forall(rs =>
      rs.map(_._2).sorted.sameElements(1L to rs.length)))
  }

  test("hot-cell sub-split: bulk query and screen results identical under forced splitting") {
    val (all, _) = fixture()
    val dir = tempDir("annidx_split")
    AnnIndex.buildIvf(all, "embedding", "vec_id", dir, nlist = 4, iters = 3)
    // the sub-split engages only in the SHUFFLE regime (a broadcast-
    // sized probe side needs no splitting — the join is scan-parallel);
    // the fixture probe tables would broadcast, so force the regime
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // maxCellRows = 2 forces every fixture cell into many sub-splits;
      // the huge bound keeps the plain single-key join — output sets
      // must be bit-identical (splitting only partitions the corpus side)
      val plain = AnnIndex.queryIvfBulk(spark, dir, all, "embedding", "vec_id",
          k = 3, nprobe = 2, maxCellRows = Long.MaxValue)
        .as[(Long, Long, Long, Double)].collect().toSet
      val split = AnnIndex.queryIvfBulk(spark, dir, all, "embedding", "vec_id",
          k = 3, nprobe = 2, maxCellRows = 2)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(split == plain)
      assert(split.nonEmpty)
      val batch = all.filter(col("vec_id") % 5 === 0)
      val screenPlain = AnnIndex.screenIvf(spark, dir, batch, "embedding",
          "vec_id", threshold = 0.35, nprobe = 2, maxCellRows = Long.MaxValue)
        .as[(Long, Long, Double)].collect().toSet
      val screenSplit = AnnIndex.screenIvf(spark, dir, batch, "embedding",
          "vec_id", threshold = 0.35, nprobe = 2, maxCellRows = 2)
        .as[(Long, Long, Double)].collect().toSet
      assert(screenSplit == screenPlain)
      assert(screenSplit.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("maintainIvf: below threshold is a no-op; drift past it rebuilds and re-zeros") {
    val (all, qs) = fixture()
    val base = all.filter(col("vec_id") % 2 === 0)
    val dir = tempDir("annidx_maint")
    AnnIndex.buildIvf(base, "embedding", "vec_id", dir, nlist = 8, iters = 5)
    // fresh index: zero drift -> no rebuild, index untouched
    val (tvd0, ran0) = AnnIndex.maintainIvf(spark, dir, "embedding", "vec_id",
      tvdThreshold = 0.05, nlist = 8, iters = 5)
    assert(tvd0 == 0.0 && !ran0)
    // a skewed append (every vector near one committed vector) drifts
    // the occupancy; maintain must rebuild and re-zero the drift
    val v0 = base.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val hot = spark.range(500000L, 500400L).select(
        col("id").as("vec_id"),
        transform(typedLit(v0), (x, i) =>
          (x.cast("double") + pmod(col("id") + i * 3, lit(17)).cast("double") / 1e3)
            .cast("float")).as("embedding"))
      .localCheckpoint(true)
    AnnIndex.appendIvf(hot, "embedding", "vec_id", dir)
    val (tvd1, ran1) = AnnIndex.maintainIvf(spark, dir, "embedding", "vec_id",
      tvdThreshold = 0.05, nlist = 8, iters = 5)
    assert(tvd1 > 0.05 && ran1, s"drifted TVD $tvd1 must trigger the rebuild")
    val (tvd2, ran2) = AnnIndex.maintainIvf(spark, dir, "embedding", "vec_id",
      tvdThreshold = 0.05, nlist = 8, iters = 5)
    assert(tvd2 == 0.0 && !ran2, "rebuild re-snapshots cell_stats")
    // the rebuilt index answers exactly like the in-memory trained
    // operator over the same union corpus (the buildIvf contract)
    val union = base.select("vec_id", "embedding")
      .unionByName(hot.select("vec_id", "embedding"))
    val persisted = AnnIndex.queryIvf(spark, dir, qs, "embedding", "vec_id",
        k = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    val inMemory = Similarity.ivfTopKTrained(union, qs, "embedding", "vec_id",
        k = 5, nlist = 8, iters = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(persisted == inMemory)
    assert(persisted.nonEmpty)
    // the IVFADC twin: same trigger, rebuild retrains pivots+codebooks
    val adcDir = tempDir("annidx_maint_adc")
    AnnIndex.buildIvfAdc(base, "embedding", "vec_id", adcDir, nlist = 8,
      m = 8, ksub = 16, iters = 2)
    AnnIndex.appendIvfAdc(hot, "embedding", "vec_id", adcDir)
    val (atvd, aran) = AnnIndex.maintainIvfAdc(spark, adcDir, "embedding",
      "vec_id", tvdThreshold = 0.05, nlist = 8, m = 8, ksub = 16, iters = 2)
    assert(atvd > 0.05 && aran)
    val (atvd2, aran2) = AnnIndex.maintainIvfAdc(spark, adcDir, "embedding",
      "vec_id", tvdThreshold = 0.05, nlist = 8, m = 8, ksub = 16, iters = 2)
    assert(atvd2 == 0.0 && !aran2)
    // the rebuilt ADC index still serves: complete ranks, non-empty
    val adcRes = AnnIndex.queryIvfAdc(spark, adcDir, qs, "embedding",
        "vec_id", k = 5, nprobe = 2, shortlist = 10)
      .as[(Long, Long, Long, Double)].collect()
    assert(adcRes.nonEmpty && adcRes.map(_._1).distinct.length == qs.count())
  }

  test("append routes with frozen centroids: index == rebuilt-from-union query surface") {
    val (all, qs) = fixture()
    val base = all.filter(col("vec_id") % 3 =!= 0L)
    val late = all.filter(col("vec_id") % 3 === 0L && col("vec_id") >= 10L)
    val dir = tempDir("annidx3")
    AnnIndex.buildIvf(base, "embedding", "vec_id", dir, nlist = 8, iters = 5)
    AnnIndex.appendIvf(late, "embedding", "vec_id", dir)
    val appended = AnnIndex.queryIvf(spark, dir, qs, "embedding", "vec_id",
        k = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    // reference: one in-memory pass over base ∪ late using the SAME
    // centroids (trained on base only) — appendIvf must not retrain
    val centsDf = spark.read.parquet(s"$dir/centroids")
    val union = base.unionByName(late)
    val dir2 = tempDir("annidx4")
    centsDf.write.parquet(s"$dir2/centroids")
    Similarity.ivfRoute(union, centsDf, "embedding", "vec_id")
      .write.partitionBy("cell_id").parquet(s"$dir2/corpus")
    val rebuilt = AnnIndex.queryIvf(spark, dir2, qs, "embedding", "vec_id",
        k = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(appended == rebuilt)
    assert(appended.nonEmpty)
  }

  test("screen-then-append: dupes flagged against the persisted corpus, clean rows ingested") {
    val (all, _) = fixture()
    val corpus = all.filter(col("vec_id") % 5 =!= 0)
    val batch = all.filter(col("vec_id") % 5 === 0)
    val dir = tempDir("annidx7")
    AnnIndex.buildIvf(corpus, "embedding", "vec_id", dir, nlist = 8, iters = 5)
    val before = spark.read.parquet(s"$dir/corpus").count()

    // reference screen: probe assignment + exact cosine, computed locally
    val cents = spark.read.parquet(s"$dir/centroids")
    val qCells = Similarity.ivfProbeCells(batch, cents, "embedding", "vec_id", 2)
      .select("query_id", "cell_id").as[(Long, Long)].collect().toSet
    val routed = Similarity.ivfRoute(corpus, cents, "embedding", "vec_id")
      .select("vec_id", "cell_id").as[(Long, Long)].collect().toMap
    val vecs = all.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    // routed.toSeq: yielding tuples while iterating the Map directly
    // would rebuild a Map keyed by q and silently collapse the pairs
    val expected = (for {
      (q, cell) <- qCells.toSeq
      (c, ccell) <- routed.toSeq if ccell == cell
      s = cos(vecs(q), vecs(c)) if s >= 0.35
    } yield (q, c)).toSet

    val dupes = AnnIndex.ingestIvf(spark, dir, batch, "embedding", "vec_id",
      threshold = 0.35, nprobe = 2)
    val got = dupes.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.nonEmpty, "fixture should produce at least one near-dup pair")
    // dupes stay stable after the append mutated the index (eager screen)
    assert(dupes.select("id_a", "id_b").as[(Long, Long)].collect().toSet == got)
    // exactly the clean batch rows were appended, under frozen routing
    val after = spark.read.parquet(s"$dir/corpus")
    val dupIds = got.map(_._1)
    assert(after.count() == before + batch.count() - dupIds.size)
    val appendedIds = after.select("vec_id").as[Long].collect().toSet
    val batchIds = batch.select("vec_id").as[Long].collect().toSet
    assert(appendedIds == routed.keySet ++ (batchIds -- dupIds))
    // the ingested rows are queryable through the same index
    val cleanId = (batchIds -- dupIds).head
    val q = all.filter(col("vec_id") === cleanId)
    val res = AnnIndex.queryIvf(spark, dir, q, "embedding", "vec_id",
        k = 3, nprobe = 8)
      .as[(Long, Long, Long, Double)].collect()
    assert(res.nonEmpty && res.forall(_._1 == cleanId))
  }

  test("IVFADC screen-then-append: frozen-pivot screen, clean rows re-encoded under frozen codebooks") {
    val (all, _) = fixture()
    val corpus = all.filter(col("vec_id") % 5 =!= 0)
    val batch = all.filter(col("vec_id") % 5 === 0)
    val dir = tempDir("adcidx7")
    AnnIndex.buildIvfAdc(corpus, "embedding", "vec_id", dir,
      nlist = 8, m = 8, ksub = 16, iters = 3)
    val before = spark.read.parquet(s"$dir/corpus").count()
    // reference screen: same replay as the IVF case, pivots as routing
    val pivots = spark.read.parquet(s"$dir/pivots")
    val qCells = Similarity.ivfProbeCells(batch, pivots, "embedding", "vec_id", 2)
      .select("query_id", "cell_id").as[(Long, Long)].collect().toSet
    val routed = Similarity.ivfRoute(corpus, pivots, "embedding", "vec_id")
      .select("vec_id", "cell_id").as[(Long, Long)].collect().toMap
    val vecs = all.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    val expected = (for {
      (q, cell) <- qCells.toSeq
      (c, ccell) <- routed.toSeq if ccell == cell
      s = cos(vecs(q), vecs(c)) if s >= 0.35
    } yield (q, c)).toSet
    val dupes = AnnIndex.ingestIvfAdc(spark, dir, batch, "embedding", "vec_id",
      threshold = 0.35, nprobe = 2)
    val got = dupes.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // accounting + the appended rows carry codes under the FROZEN model:
    // querying after ingest must still be answerable (codes present)
    val after = spark.read.parquet(s"$dir/corpus")
    val dupIds = got.map(_._1)
    assert(after.count() == before + batch.count() - dupIds.size)
    assert(after.filter(col("codes").isNull).count() == 0)
    val cleanId = (batch.select("vec_id").as[Long].collect().toSet -- dupIds).head
    val res = AnnIndex.queryIvfAdc(spark, dir,
        all.filter(col("vec_id") === cleanId), "embedding", "vec_id",
        k = 3, nprobe = 8)
      .as[(Long, Long, Long, Double)].collect()
    assert(res.nonEmpty && res.forall(_._1 == cleanId))
  }

  test("persisted IVFADC query == in-memory ivfAdcTopK, bit for bit") {
    val (all, qs) = fixture()
    val dir = tempDir("adcidx")
    AnnIndex.buildIvfAdc(all, "embedding", "vec_id", dir,
      nlist = 8, m = 8, ksub = 16, iters = 2)
    val persisted = AnnIndex.queryIvfAdc(spark, dir, qs, "embedding", "vec_id",
        k = 5, nprobe = 2, shortlist = 15)
      .as[(Long, Long, Long, Double)].collect().toSet
    val inMemory = Pq.ivfAdcTopK(all, qs, "embedding", "vec_id",
        k = 5, nlist = 8, nprobe = 2, m = 8, ksub = 16, iters = 2,
        shortlist = 15)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(persisted == inMemory)
    assert(persisted.nonEmpty)
  }

  test("IVFADC append encodes under frozen codebooks; compaction bounds files and preserves results") {
    val (all, qs) = fixture()
    val base = all.filter(col("vec_id") % 3 =!= 0L)
    val lateA = all.filter(col("vec_id") % 3 === 0L && col("vec_id") % 2 === 0L
      && col("vec_id") >= 10L)
    val lateB = all.filter(col("vec_id") % 3 === 0L && col("vec_id") % 2 === 1L
      && col("vec_id") >= 10L)
    val dir = tempDir("adcidx2")
    AnnIndex.buildIvfAdc(base, "embedding", "vec_id", dir,
      nlist = 8, m = 8, ksub = 16, iters = 2)
    AnnIndex.appendIvfAdc(lateA, "embedding", "vec_id", dir)
    AnnIndex.appendIvfAdc(lateB, "embedding", "vec_id", dir)
    val appended = AnnIndex.queryIvfAdc(spark, dir, qs, "embedding", "vec_id",
        k = 5, nprobe = 2, shortlist = 15)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(appended.nonEmpty)
    // appended rows must carry codes from the codebooks trained on BASE:
    // re-encoding the union under the persisted model reproduces the
    // stored codes exactly
    val cells = spark.read.parquet(s"$dir/corpus")
      .select(col("vec_id"), col("codes")).as[(Long, Seq[Int])].collect().toMap
    assert(cells.keySet == (base.unionByName(lateA).unionByName(lateB))
      .select("vec_id").as[Long].collect().toSet)
    // build (2 appends) leaves >1 file in touched cells; compaction
    // rewrites to ≤ 1 file per cell and changes NOTHING observable
    val (before, after) = AnnIndex.compactIvf(spark, dir)
    val nCells = spark.read.parquet(s"$dir/corpus")
      .select("cell_id").distinct().count().toInt
    assert(after <= nCells, s"after=$after cells=$nCells")
    assert(after <= before)
    val compacted = AnnIndex.queryIvfAdc(spark, dir, qs, "embedding", "vec_id",
        k = 5, nprobe = 2, shortlist = 15)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(compacted == appended)
  }

  test("IVF compaction after appends: file count bounded, results byte-identical") {
    val (all, qs) = fixture()
    val base = all.filter(col("vec_id") % 3 =!= 0L)
    val late = all.filter(col("vec_id") % 3 === 0L && col("vec_id") >= 10L)
    val dir = tempDir("annidx5")
    AnnIndex.buildIvf(base, "embedding", "vec_id", dir, nlist = 8, iters = 5)
    AnnIndex.appendIvf(late, "embedding", "vec_id", dir)
    val pre = AnnIndex.queryIvf(spark, dir, qs, "embedding", "vec_id",
        k = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    val (before, after) = AnnIndex.compactIvf(spark, dir)
    assert(after <= before)
    val nCells = spark.read.parquet(s"$dir/corpus")
      .select("cell_id").distinct().count().toInt
    assert(after <= nCells, s"after=$after cells=$nCells")
    val post = AnnIndex.queryIvf(spark, dir, qs, "embedding", "vec_id",
        k = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(post == pre)
    assert(post.nonEmpty)
  }

  test("routingDrift: zero at build, grows under a skewed append, unchanged by compaction") {
    val (all, _) = fixture()
    val base = all.filter(col("vec_id") % 3 =!= 0L)
    val dir = tempDir("driftidx")
    AnnIndex.buildIvf(base, "embedding", "vec_id", dir, nlist = 8, iters = 5)
    def tvd: Double = AnnIndex.routingDrift(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("abs_diff")).head().getDouble(0) / 2.0
    assert(tvd == 0.0, s"fresh index drifted: $tvd")
    // skewed append: clones of ONE existing vector all route to one cell
    val one = base.limit(1).select(col("embedding")).head().getSeq[Float](0)
    import spark.implicits._
    val skew = (100000L until 100300L).map(i => (i, one)).toDF("vec_id", "embedding")
    AnnIndex.appendIvf(skew, "embedding", "vec_id", dir)
    val drifted = tvd
    assert(drifted > 0.05, s"skewed append should move occupancy: $drifted")
    AnnIndex.compactIvf(spark, dir)
    assert(tvd == drifted, "compaction must not change the drift readout")
  }

  test("crashed compaction (index parked at corpus__old) recovers on next read") {
    val (all, qs) = fixture()
    val dir = tempDir("annidx6")
    AnnIndex.buildIvf(all, "embedding", "vec_id", dir, nlist = 8, iters = 5)
    val pre = AnnIndex.queryIvf(spark, dir, qs, "embedding", "vec_id",
        k = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    // simulate a crash between compactIvf's two renames: corpus is gone,
    // the complete pre-compaction index sits at corpus__old, and a
    // half-written temp is lying around
    val conf = spark.sparkContext.hadoopConfiguration
    val corpus = new org.apache.hadoop.fs.Path(s"$dir/corpus")
    val fs = corpus.getFileSystem(conf)
    fs.rename(corpus, new org.apache.hadoop.fs.Path(s"$dir/corpus__old"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/corpus__compact/cell_id=0"))
    val post = AnnIndex.queryIvf(spark, dir, qs, "embedding", "vec_id",
        k = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(post == pre)
    assert(fs.exists(corpus), "recovery must restore the corpus directory")
  }

  test("IVFADC probe scan prunes cell partitions") {
    val (all, qs) = fixture()
    val dir = tempDir("adcidx3")
    AnnIndex.buildIvfAdc(all, "embedding", "vec_id", dir,
      nlist = 8, m = 8, ksub = 16, iters = 2)
    val one = qs.filter(col("vec_id") === 0L)
    val df = AnnIndex.queryIvfAdc(spark, dir, one, "embedding", "vec_id",
      k = 5, nprobe = 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [cell_id"), p.take(1200))
  }

  test("probe scan prunes cell partitions") {
    val (all, qs) = fixture()
    val dir = tempDir("annidx2")
    AnnIndex.buildIvf(all, "embedding", "vec_id", dir, nlist = 8, iters = 5)
    val one = qs.filter(col("vec_id") === 0L)
    val df = AnnIndex.queryIvf(spark, dir, one, "embedding", "vec_id",
      k = 5, nprobe = 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [cell_id"), p.take(1200))
    // one query probing 2 of 8 cells: the scan reads at most 2 partition
    // directories, not the whole index
    val scanned = "partitions read: (\\d+)".r.findFirstMatchIn(p)
    scanned.foreach(m => assert(m.group(1).toInt <= 2, p.take(1200)))
  }
}
