package graft

import org.apache.spark.sql.functions._

/** One-off scale probe: replicate the documents corpus N times (each doc
  * gains N exact near-dup siblings) and run the fuzzy-dedup operators —
  * checks that candidate generation stays bounded when duplicate clusters
  * appear (the adversarial case for LSH bucketing).
  *
  * Usage: runMain graft.ScaleProbe [factor]
  *
  * Cache discipline: plain `.cache()` is fine HERE (unlike in operators) —
  * the probe is a run-once main whose caches die with the process; the
  * replicated corpus is deliberately pinned across probes so each timing
  * measures the operator, not the replication explode.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(8)
    val spark = GraftSession.getOrCreate("graft-scale-probe")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val n = docs.count()
    val big = docs
      .withColumn("__rep", explode(sequence(lit(0), lit(factor - 1))))
      .select((col("doc_id") + col("__rep") * n * 10).as("doc_id"), col("text"))
      .cache()
    println(s"corpus: ${big.count()} docs (${factor}x)")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.1f s, $rows rows")
    }
    // construction is INSIDE the timer: the LSH operators run their eager
    // cache-materialization jobs while being built, and excluding that
    // undercounts the pipeline (pairs cached so the components timing
    // measures ONLY the keep-list pass)
    var pairs: org.apache.spark.sql.DataFrame = null
    time("minhash_lsh_pairs")({
      pairs = graft.operators.Dedup.minhashLsh(
        big, "text", "doc_id", k = 8, threshold = 0.3).cache()
      pairs.count()
    })
    time("cluster_reps_only")(
      graft.operators.Dedup.clusterReps(big, pairs, "doc_id").count())
    pairs.unpersist()
    spark.catalog.clearCache() // drop operator-internal scratch caches
    big.cache().count()
    time("simhash")(graft.operators.Dedup.simhashPairs(
      big, "text", "doc_id", maxHamming = 3).count())
    spark.catalog.clearCache()
    big.cache().count()
    time("exact")(graft.operators.Dedup.exact(big, "text", "doc_id").count())
    spark.catalog.clearCache()
    // incremental claim check: per-batch cost must track the batch, not
    // the corpus. State build is the one-time cost; the batch pass joins
    // against it without re-shingling history.
    val corpus = big.filter(col("doc_id") % 8 =!= 0).cache(); corpus.count()
    val batch = big.filter(col("doc_id") % 8 === 0).cache(); batch.count()
    var st: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = null
    time("minhash_state_build")({
      st = graft.operators.Dedup.minhashState(corpus, "text", "doc_id", k = 8)
      st._1.count()
    })
    time("minhash_incremental_batch")(
      graft.operators.Dedup.minhashLshIncremental(batch, st._1, st._2,
        "text", "doc_id", k = 8, threshold = 0.3).count())
    spark.catalog.clearCache()
    // embeddings replicated the same way: every vector gains factor-1 exact
    // duplicates — the bucket-cap adversarial case for SRP LSH
    val embs = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val m = embs.count()
    val bigV = embs
      .withColumn("__rep", explode(sequence(lit(0), lit(factor - 1))))
      .select((col("vec_id") + col("__rep") * m * 10).as("vec_id"), col("embedding"))
      .cache()
    println(s"vectors: ${bigV.count()} (${factor}x)")
    time("embedding_near_dup")(graft.operators.Dedup.embeddingNearDup(
      bigV, "embedding", "vec_id", threshold = 0.35,
      bits = 4, tables = 12, maxBucket = 200).count())
    time("srp_topk")(graft.operators.Similarity.srpTopK(
      bigV, bigV.filter(col("vec_id") < 10), "embedding", "vec_id",
      k = 5, bits = 8, tables = 4, maxBucket = 2000).count())
    spark.catalog.clearCache()
    bigV.cache().count()
    // k-means + semantic dedup on the replicated vectors: every cluster is
    // a stack of exact duplicates — the degenerate-mega-cluster case the
    // maxCluster cap exists for. Run once capped (pairs bounded) and once
    // with the cap high enough to admit the full duplicate stacks.
    time("kmeans_8x2")({
      graft.operators.Clustering.kmeans(bigV, "embedding", "vec_id",
        k = 8, iters = 2).length.toLong
    })
    time("semantic_dedup_capped")(graft.operators.Clustering.semanticDedup(
      bigV, "embedding", "vec_id", k = 8, iters = 1, threshold = 0.35,
      maxCluster = 500).count())
    time("semantic_dedup_full")(graft.operators.Clustering.semanticDedup(
      bigV, "embedding", "vec_id", k = 8, iters = 1, threshold = 0.35,
      maxCluster = 100000).count())
    spark.catalog.clearCache()
    // bloom decontamination in the shuffle-join regime: the corpus side is
    // factor× replicated, the bench side is 1/8 of it — the bloom must cut
    // the corpus shingle stream before the exchange
    val corpus2 = big.filter(col("doc_id") % 8 =!= 0)
    val bench2 = big.filter(col("doc_id") % 8 === 0)
    time("decontam_plain_shuffle")(graft.operators.Decontam.overlap(
      corpus2, bench2, "text", "doc_id", k = 8, broadcastBench = false).count())
    time("decontam_bloom_shuffle")(graft.operators.Decontam.overlapBloom(
      corpus2, bench2, "text", "doc_id", k = 8, broadcastBench = false).count())
    spark.catalog.clearCache()
    time("stratified_sample")(graft.operators.CorpusOps.sampleStratified(
      big.withColumn("lang", (col("doc_id") % 4).cast("string")),
      "doc_id", "lang", n = 1000).count())
    time("global_shuffle")(graft.operators.CorpusOps.globalShuffle(
      big, "doc_id").count())
    // domain cap under heavy skew: one mega-domain holds half the corpus,
    // the rest spread thin — the bounded-heap TopKPerKey must keep ≤ n
    // per domain without window-sorting the replicated corpus
    time("domain_cap_skewed")(graft.operators.CorpusOps.domainCap(
      big.withColumn("source",
        when(col("doc_id") % 2 === 0, lit("mega"))
          .otherwise(concat(lit("s"), col("doc_id") % 997))),
      "doc_id", "source", col("doc_id").cast("double"), n = 10).count())
    // temperature mixture on the same skew: the count agg sees one huge
    // and many tiny keys; rates broadcast back, selection stays map-only
    time("mixture_temperature_skewed")(graft.operators.CorpusOps.mixtureTemperature(
      big.withColumn("source",
        when(col("doc_id") % 2 === 0, lit("mega"))
          .otherwise(concat(lit("s"), col("doc_id") % 997))),
      "doc_id", "source", alpha = 0.3, targetFraction = 0.2).count())
    spark.catalog.clearCache()
    // PQ ANN on the duplicate-stacked vectors: training sees every
    // centroid swamped by identical points (codebooks still converge),
    // encoding is map-only over factor×N vectors, and ADC+refine must
    // stay linear — the shortlist join is candidates-only by shape.
    bigV.cache().count()
    time("pq_train_encode_topk")(graft.operators.Pq.pqTopK(
      bigV, bigV.filter(col("vec_id") < 10), "embedding", "vec_id",
      k = 5, m = 8, ksub = 16, iters = 2, shortlist = 50).count())
    spark.catalog.clearCache()
    // boilerplate removal where EVERY line is template-hot: the replicated
    // corpus makes each doc's text line df = factor, so with minDf <=
    // factor the hot set is the whole distinct-line table — the broadcast
    // side is bounded by DISTINCT lines, not corpus size, and reassembly
    // must still be one shuffle.
    time("boilerplate_all_hot")(graft.operators.TextAnalysis.removeBoilerplateLines(
      big.withColumn("source", lit("one")), "text", "doc_id", "source",
      minDf = factor).count())
    spark.catalog.clearCache()
    // chunking at factor×: pure map stage — wall time must scale with
    // output tokens only (no shuffle to regress)
    time("chunk_docs")(graft.operators.CorpusOps.chunkDocs(
      big, "doc_id", "text", chunkTokens = 64, stride = 48).count())
    spark.catalog.clearCache()
    // weighted sampling at factor×: TakeOrderedAndProject keeps per-task
    // state at k rows regardless of corpus size
    time("weighted_sample")(graft.operators.CorpusOps.sampleWeighted(
      big, "doc_id", length(col("text")).cast("double"), k = 1000).count())
    spark.catalog.clearCache()
    // tokenize + pack at factor×: merges train on a 1/32 sample, the full
    // replicated corpus encodes map-only, and the block packer's
    // token-level explode + (stream, bin) shuffle must scale with tokens
    big.cache().count()
    time("tokenize_pack")({
      val merges = graft.operators.Bpe.train(
        big.filter(col("doc_id") % 32 === 0), "text", numMerges = 8)
      val (ids, _) = graft.operators.Bpe.encodeIds(big, "text", "doc_id", merges)
      graft.operators.CorpusOps.packTokens(ids, "doc_id", "token_ids",
        blockSize = 2048, blocks = 32).count()
    })
    spark.catalog.clearCache()
    // Naive Bayes at factor×: the model stays label×bucket-bounded no
    // matter how big the corpus, training + classify are each one corpus
    // pass, and the pivoted per-bucket likelihood vector keeps the score
    // aggregate input at one row per (doc, bucket)
    big.cache().count()
    // label modulus coprime with the % 4 training slice so the sample
    // carries all three labels
    val labeled = big.withColumn("lang", concat(lit("l"), col("doc_id") % 3))
    time("naive_bayes_train_classify")({
      val model = graft.operators.NaiveBayes.train(
        labeled.filter(col("doc_id") % 4 === 0), "doc_id", "text", "lang",
        buckets = 512)
      graft.operators.NaiveBayes.classify(labeled, model, "doc_id", "text",
        buckets = 512).count()
    })
    spark.catalog.clearCache()
    // DSIR at factor×: one shared bigram-bucket featurize pass per side,
    // a bucket-bounded broadcast llr table, and Gumbel top-k as a
    // bounded-heap TakeOrderedAndProject — nothing corpus-sized collects
    big.cache().count()
    time("dsir_select")(graft.operators.Dsir.select(
      big, big.filter(col("doc_id") % 4 === 0), "doc_id", "text",
      buckets = 1024, k = 1000, salt = "probe").count())
    spark.catalog.clearCache()
    // snapshot diff at factor×: both sides reduce map-side to
    // (key, md5) before the single full-outer join — the probe's wall
    // time must track the narrow hash columns, not the text width
    big.cache().count()
    time("cdc_table_diff")({
      val oldSnap = big.filter(col("doc_id") % 7 =!= 0)
      val newSnap = big.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      graft.operators.Cdc.tableDiff(oldSnap, newSnap,
        Seq("doc_id"), Seq("text")).count()
    })
    spark.catalog.clearCache()
    // funnel at factor×: events replicated with fresh user ids; the
    // pushed step-type isin filter means the per-entity window buffers
    // only funnel-relevant rows even when the corpus multiplies
    val ev = Tables.load(spark, "/root/testdata/sf0.1", "events")
    val nu = ev.agg(max(col("user_id"))).head().getLong(0) + 1
    val ne = ev.agg(max(col("event_id"))).head().getLong(0) + 1
    val bigE = ev
      .withColumn("__rep", explode(sequence(lit(0), lit(factor - 1))))
      .select((col("user_id") + col("__rep") * nu).as("user_id"),
        (col("event_id") + col("__rep") * ne).as("event_id"),
        col("event_type"), col("ts"), col("value"))
      .cache()
    println(s"events: ${bigE.count()} (${factor}x)")
    time("funnel_times")(graft.operators.Funnel.funnelTimes(
      bigE, "user_id", "event_type", "ts",
      Seq("signup", "click", "purchase")).count())
    spark.catalog.clearCache()
    bigE.cache().count()
    // transition extraction at factor×: the lead window shuffles once by
    // entity; the edge list stays |types|²-bounded however big the corpus
    time("markov_transitions")(graft.operators.Graph.transitions(
      bigE, "user_id", "event_type", "ts", "event_id").count())
    // pageRank end-to-end: edge extraction is the corpus-scale part; the
    // 5 iterations run on the bounded edge list (flat with factor)
    time("pagerank_5it")({
      val e = graft.operators.Graph.transitions(
        bigE, "user_id", "event_type", "ts", "event_id")
      graft.operators.Graph.pageRank(e, "src", "dst", "n", iters = 5).count()
    })
    // MAD outliers at factor×: two grouped exact-percentile passes plus
    // broadcast stat joins — the replicated values keep identical
    // medians, so the flagged fraction must stay constant
    time("mad_outliers")(graft.operators.Outliers.madOutliers(
      bigE, "event_type", "event_id", "value", threshold = 3.5).count())
    spark.catalog.clearCache()
    // column profile at factor×: one scan, Expand ×k into partial aggs;
    // the exchange is k rows per partition regardless of corpus size
    big.cache().count()
    time("profile")(graft.operators.Profile.profile(
      big.withColumn("source", concat(lit("s"), col("doc_id") % 997)),
      Seq("doc_id", "text", "source")).count())
    spark.catalog.clearCache()
    // salted join under a genuine hot key (half the corpus on one key):
    // plain shuffle join vs 16-bucket salted — semantics equal by
    // ScaleToolsSpec, this measures the skew mitigation itself
    val skewBig = big.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, lit(0L)).otherwise(col("doc_id") % 997).as("k"))
      .cache()
    skewBig.count()
    val dim = spark.range(0, 997).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))
    time("join_plain_hotkey")(skewBig.join(dim, "k").count())
    time("join_salted_hotkey")(graft.operators.Skew.saltedEquiJoin(
      skewBig, dim, "k", buckets = 16).count())
    spark.catalog.clearCache()
    // PCA covariance A/B — gramian aggregate (default) vs relational
    // self-join (oracle anchor), bit-equal by PcaSpec. The aggregate's
    // win is a CONSTANT factor that grows with d: at factor× and d=64
    // both are corpus-linear; the d=256 pair below (4×-concatenated
    // embeddings, unreplicated corpus) isolates the d² row-machinery
    // cost the self-join pays and the flat buffer doesn't.
    bigV.cache().count()
    time("pca_pc1_gramian")(graft.operators.Pca.powerIterationPc1(
      bigV, "embedding", "vec_id", dim = 64, iters = 6, gramian = true).count())
    time("pca_pc1_selfjoin")(graft.operators.Pca.powerIterationPc1(
      bigV, "embedding", "vec_id", dim = 64, iters = 6, gramian = false).count())
    spark.catalog.clearCache()
    val wideV = embs.select(col("vec_id"), flatten(array(
        col("embedding"),
        transform(col("embedding"), x => (x * lit(-1.0)).cast("float")),
        transform(col("embedding"), x => (x * lit(0.5)).cast("float")),
        transform(col("embedding"), x => (x * lit(-0.25)).cast("float"))))
        .as("embedding"))
      .cache()
    println(s"wide vectors: ${wideV.count()} (d=256)")
    time("pca_pc1_d256_gramian")(graft.operators.Pca.powerIterationPc1(
      wideV, "embedding", "vec_id", dim = 256, iters = 6, gramian = true).count())
    time("pca_pc1_d256_selfjoin")(graft.operators.Pca.powerIterationPc1(
      wideV, "embedding", "vec_id", dim = 256, iters = 6, gramian = false).count())
    spark.catalog.clearCache()
    // persisted IVF index at factor×: build cost scales with the corpus
    // (train + route + write); QUERY cost scales with the probed cells
    // only — the partition prune reads nprobe/nlist of the index bytes,
    // so the query probe must grow far slower than the build probe
    bigV.cache().count()
    val idxDir = java.nio.file.Files.createTempDirectory("graft_probe_idx").toString
    time("ann_index_build")({
      graft.operators.AnnIndex.buildIvf(bigV, "embedding", "vec_id", idxDir,
        nlist = 16, iters = 3)
      1L
    })
    time("ann_index_query")(graft.operators.AnnIndex.queryIvf(
      spark, idxDir, bigV.filter(col("vec_id") < 10), "embedding", "vec_id",
      k = 5, nprobe = 2).count())
    spark.catalog.clearCache()

    // ---- round-6 operators at factor× ----
    // containment: same df-capped inverted-index shape as jaccard — must
    // scale like it (both directions emitted from ONE intersection count)
    big.cache().count()
    time("containment")(graft.operators.Dedup.ngramContainment(
      big, "text", "doc_id", k = 8, threshold = 0.8).count())
    // t-closeness over replicated quasi/sensitive columns: one
    // (quasi × sensitive) aggregate + model-sized window/broadcast tail
    val priv = big
      .withColumn("source", concat(lit("s"), col("doc_id") % 997))
      .withColumn("lang", concat(lit("l"), col("doc_id") % 7))
    time("t_closeness")(graft.operators.Privacy.tClosenessViolations(
      priv, Seq("source"), "lang", t = 0.05).count())
    // split: exact quotas (one stratum shuffle) vs hash thresholds
    // (map-only) — the anchor/scale-path cost gap, measured
    val strat = big.withColumn("lang", concat(lit("l"), col("doc_id") % 5))
    val fr = Seq("train" -> 0.75, "validation" -> 0.125, "test" -> 0.125)
    time("split_exact")(graft.operators.CorpusOps.splitStratified(
      strat, "doc_id", "lang", fr, exact = true).count())
    time("split_hash")(graft.operators.CorpusOps.splitStratified(
      strat, "doc_id", "lang", fr, exact = false).count())
    // curriculum: range-partitioned per-source + global ranks
    time("curriculum")(graft.operators.CorpusOps.curriculumOrder(
      big.withColumn("source", concat(lit("s"), col("doc_id") % 997)),
      "doc_id", "source", length(col("text")).cast("double")).count())
    // curriculum under EXTREME source skew (one source = 90% of rows):
    // the r6-flagged Window.partitionBy(source) row_number funnels the
    // mega-source through ONE task's sort; the range-partitioned per-key
    // rank spreads it across the cluster. Output identical
    // (CorpusOpsSpec pins it) — this A/B measures the funnel fix itself,
    // so the corpus is the scale-limiting shape: ~20M NARROW rows
    // (id, source, score) fanned out from the docs fixture — a
    // production corpus has few, huge sources, and the sort payload is
    // exactly these three columns after curriculumOrder's projection.
    val skewSrc = big
      .withColumn("__rep2", explode(sequence(lit(0), lit(499))))
      .select((col("doc_id") * 500 + col("__rep2")).as("doc_id"),
        when(col("doc_id") % 10 =!= 0, lit("mega"))
          .otherwise(concat(lit("s"), col("doc_id") % 97)).as("source"),
        (length(col("text")) * 1000 + col("__rep2")).cast("double").as("score"))
      .localCheckpoint(true) // pin: both paths read identical input
    println(s"skew corpus: ${skewSrc.count()} rows, " +
      s"${skewSrc.filter(col("source") === "mega").count()} in the mega source")
    time("curriculum_skew_window")(graft.operators.CorpusOps.curriculumOrder(
      skewSrc, "doc_id", "source", col("score"),
      rangeRank = false).count())
    time("curriculum_skew_range")(graft.operators.CorpusOps.curriculumOrder(
      skewSrc, "doc_id", "source", col("score"),
      rangeRank = true).count())
    // datasheet: one corpus pass (chained map-only featurizers + one agg)
    time("datasheet")(graft.operators.CorpusReport.datasheet(
      priv, "text", "doc_id", "lang", "source").count())
    // NFC canonicalization: map-only; the isNormalized fast path means
    // ASCII-heavy corpora pay one char scan and zero allocation per row
    time("nfc_normalize")(big.agg(sum(length(
      graft.functions.nfc_normalize(col("text"))))).head().getLong(0))
    spark.catalog.clearCache()
    // persisted IVFADC: build scales with the corpus (train + encode +
    // write), query with the probed cells' CODES only
    bigV.cache().count()
    val adcDir = java.nio.file.Files.createTempDirectory("graft_probe_adc").toString
    time("ivfadc_index_build")({
      graft.operators.AnnIndex.buildIvfAdc(bigV, "embedding", "vec_id",
        adcDir, nlist = 16, m = 8, ksub = 16, iters = 2)
      1L
    })
    time("ivfadc_index_query")(graft.operators.AnnIndex.queryIvfAdc(
      spark, adcDir, bigV.filter(col("vec_id") < 10), "embedding", "vec_id",
      k = 5, nprobe = 2, shortlist = 25).count())
    // prototypes: map-only scoring vs the centroid literal + TopKPerKey
    time("prototypes")(graft.operators.Clustering.prototypes(
      bigV, "embedding", "vec_id", k = 8, iters = 2, n = 10).count())
    spark.catalog.clearCache()
    // resize: partition-parallel pixel resampling over real containers
    big.cache().count()
    time("mm_resize")(graft.operators.Multimodal.resizeImages(
      graft.operators.Multimodal.synthesizeMedia(big, "text", "doc_id"),
      8, 6).count())

    // ---- round-7 operators at factor× ----
    // unigram train: per-EM-round cost is ONE map-only Viterbi pass +
    // one vocab-bounded count shuffle over the DISTINCT-WORD table —
    // a duplicate-stacked corpus multiplies word WEIGHTS, not rows, so
    // train should be near-flat in factor; encode is map-only per doc
    var uniPieces: Seq[graft.operators.UnigramLm.Piece] = null
    time("unigram_train")({
      uniPieces = graft.operators.UnigramLm.train(big, "text")
      uniPieces.length.toLong
    })
    time("unigram_encode")(graft.operators.UnigramLm.encode(
      big, "text", "doc_id", uniPieces).count())
    spark.catalog.clearCache()
    // persisted-index screen + bulk query: both make the QUERY side
    // arbitrary-sized (equi-join on cell_id, no broadcast); self-kNN of
    // the whole corpus is the bulk shape the broadcast path cannot run
    bigV.cache().count()
    time("ann_screen_batch")(graft.operators.AnnIndex.screenIvf(
      spark, idxDir, bigV.filter(col("vec_id") % 4 === 0), "embedding",
      "vec_id", threshold = 0.35, nprobe = 2).count())
    time("ann_bulk_selfknn")(graft.operators.AnnIndex.queryIvfBulk(
      spark, idxDir, bigV, "embedding", "vec_id", k = 3, nprobe = 2).count())

    // ---- round-8: drifted-index hot-cell A/B ----
    // The cell_id equi-join's adversarial case: append a mass of
    // near-identical vectors (deterministic per-row jitter keeps them
    // distinct; all route to ONE cell under the frozen centroids), then
    // bulk-query with probes into that cell. The unsplit join funnels
    // |hot cell| × |probes| cosine evaluations through one task; the
    // occupancy-derived sub-split spreads the same work across
    // ⌈|cell| / maxCellRows⌉ tasks — output identical (AnnIndexSpec
    // pins it), this measures the funnel fix itself.
    val v0 = embs.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val hot = spark.range(10000000L, 10000000L + 100000L).select(
        col("id").as("vec_id"),
        transform(typedLit(v0), (x, i) =>
          (x.cast("double") + pmod(col("id") + i * 7, lit(101)).cast("double") / 1e4)
            .cast("float")).as("embedding"))
      .localCheckpoint(true)
    graft.operators.AnnIndex.appendIvf(hot, "embedding", "vec_id", idxDir)
    val drift = graft.operators.AnnIndex.routingDrift(spark, idxDir)
      .agg(sum(col("abs_diff")) / 2).head().getDouble(0)
    println(f"  drifted index TVD: $drift%.3f")
    val hotQs = hot.filter(col("vec_id") % 333 === 0).localCheckpoint(true)
    // emulate the bulk contract's SHUFFLE regime: a production probe side
    // is corpus-sized and never broadcasts — the fixture's would, hiding
    // the reducer funnel this A/B measures (the broadcast regime is
    // scan-parallel and needs no splitting; see AnnIndex.cellCandidates)
    val bcSaved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    time("ann_bulk_drifted_nosplit")(graft.operators.AnnIndex.queryIvfBulk(
      spark, idxDir, hotQs, "embedding", "vec_id", k = 3, nprobe = 1,
      maxCellRows = Long.MaxValue).count())
    time("ann_bulk_drifted_split")(graft.operators.AnnIndex.queryIvfBulk(
      spark, idxDir, hotQs, "embedding", "vec_id", k = 3, nprobe = 1,
      maxCellRows = 1L << 14).count())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcSaved)
    spark.catalog.clearCache()
    // mergeable sketches: the per-drop sketch is one scan; the MERGE is
    // model-sized — the number that matters for drops 2..N
    time("profile_sketch_drop")(graft.operators.Profile.sketch(
      big, Seq("doc_id", "text")).count())
    val sk1 = graft.operators.Profile.sketch(big, Seq("doc_id", "text"))
      .localCheckpoint(true)
    time("profile_sketch_merge")(graft.operators.Profile.mergeSketches(
      sk1.unionByName(sk1)).count())
    // text→embedding bridge + topic discovery: hashEmbed is one token
    // explode + bounded-width aggregates (linear); textTopics adds the
    // Lloyd loop on the doc-count-sized hashed table + one DF pass
    big.cache().count()
    time("hash_embed")(graft.operators.Similarity.hashEmbed(
      big, "text", "doc_id", dim = 64, salt = "p").count())
    time("text_topics")(graft.operators.Clustering.textTopics(
      big, "text", "doc_id", dim = 32, k = 8, iters = 2, topn = 5,
      salt = "p").count())
    // KN scoring: same join shape as the add-one scorer plus three
    // vocabulary-sized rollups — must track lm scoring, not the corpus
    time("lm_score_kn")({
      val (c2, c1, v) = graft.operators.LanguageModel.trainBigram(
        big.filter(col("doc_id") % 4 =!= 0), "text", "doc_id")
      graft.operators.LanguageModel.scoreBigramKN(
        big.filter(col("doc_id") % 4 === 0), "text", "doc_id", c2, c1, v).count()
    })
    spark.stop()
  }
}
