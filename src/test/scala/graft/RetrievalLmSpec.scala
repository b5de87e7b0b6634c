package graft

import org.apache.spark.sql.functions._

import graft.operators.{LanguageModel, Retrieval}
import graft.queries.ReferenceQueries

/** BM25 retrieval, bigram-LM perplexity scoring, and the power-sum
  * moments query: hand-computed expectations on tiny corpora, plus
  * agreement with Spark's built-in statistics at sf0.001.
  */
class RetrievalLmSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: hand-computed scores, tf saturation orders the ranking") {
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple apple banana"),
      (3L, "durian fig grape")).toDF("doc_id", "text")
    val q = Seq((0L, "apple")).toDF("query_id", "term")
    val out = Retrieval.bm25TopK(docs, "text", "doc_id", q, k = 10)
      .orderBy("rank").collect()
    // N=3, avgdl=3, df(apple)=2 -> idf = ln((3-2+0.5)/(2+0.5)+1) = ln(1.6)
    // dl/avgdl = 1 -> denom = tf + 1.2; tf=2 scores 4.4/3.2, tf=1 scores 2.2/2.2
    val idf = math.log(1.6)
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L)) // d2 (tf 2) above d1
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // contiguous ranks
    assert(out(0).getDouble(3) == math.rint(idf * (2 * 2.2 / 3.2) * 1e6) / 1e6)
    assert(out(1).getDouble(3) == math.rint(idf * 1.0 * 1e6) / 1e6)
  }

  test("bm25: multi-term scores sum per doc; unmatched docs absent") {
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "apple cherry"),
      (3L, "kiwi kiwi")).toDF("doc_id", "text")
    val q = Seq((7L, "apple"), (7L, "banana"), (7L, "apple")).toDF("query_id", "term")
    val out = Retrieval.bm25TopK(docs, "text", "doc_id", q, k = 10)
      .orderBy("rank").collect()
    // duplicate query term collapses (set semantics); doc 3 matches nothing
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L))
    assert(out(0).getDouble(3) > out(1).getDouble(3)) // two matched terms beat one
  }

  test("hybrid RRF: both-source docs outrank single-source; hand-computed terms") {
    val lex = Seq((0L, 1L, 100L, 5.0), (0L, 2L, 200L, 3.0))
      .toDF("query_id", "rank", "doc_id", "score")
    val vec = Seq((0L, 1L, 200L, 0.9), (0L, 2L, 300L, 0.8))
      .toDF("query_id", "rank", "neighbor_id", "cosine")
    val out = Retrieval.hybridRrf(lex, vec, k = 10)
      .orderBy("rank").as[(Long, Long, Long, Double, Long)].collect().toSeq
    // doc 200: lex rank 2 + vec rank 1 -> 1/62 + 1/61; beats both
    // single-source docs despite never ranking first on the lexical side
    val r = (x: Double) => math.rint(x * 1e6) / 1e6
    assert(out == Seq(
      (0L, 1L, 200L, r(1.0 / 62 + 1.0 / 61), 2L),
      (0L, 2L, 100L, r(1.0 / 61), 1L),
      (0L, 3L, 300L, r(1.0 / 62), 1L)))
  }

  test("bigram LM: add-one smoothing, hand-computed perplexity") {
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val (c2, c1, v) = LanguageModel.trainBigram(train, "text", "doc_id")
    assert(v.head().getLong(0) == 2)
    // c2(a,b)=2 c2(b,a)=1; c1(a)=2 c1(b)=1; V=2
    // "a b c": p(b|a)=(2+1)/(2+2)=3/4, p(c|b)=(0+1)/(1+2)=1/3
    //   product 1/4 over 2 bigrams -> perplexity exactly 2
    // "c d": both unseen prefixes -> p=(0+1)/(0+2)=1/2 twice -> perplexity 2
    val score = Seq((10L, "a b c"), (11L, "c d")).toDF("doc_id", "text")
    val out = LanguageModel.scoreBigram(score, "text", "doc_id", c2, c1, v)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 2 && out(1).getLong(1) == 1)
    assert(out(0).getDouble(3) == 2.0) // perplexity round(exp(nll),4)
    assert(out(1).getDouble(3) == 2.0)
    // single-token and empty docs produce no bigrams -> no row
    val empty = LanguageModel.scoreBigram(
      Seq((12L, "solo"), (13L, "")).toDF("doc_id", "text"), "text", "doc_id", c2, c1, v)
    assert(empty.count() == 0)
  }

  test("Kneser-Ney bigram: hand-computed interpolated probabilities, mass ≈ 1") {
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val (c2, c1, v) = LanguageModel.trainBigram(train, "text", "doc_id")
    // c2(a,b)=2 c2(b,a)=1; c1(a)=2 c1(b)=1; V=2
    // rollups: n1p(a)=n1p(b)=1; n1c(a)=n1c(b)=1; T=2
    // pcont(seen)=(1+1)/(2+2+1)=0.4, pcont(OOV)=1/5=0.2
    // "a b c": p(b|a)=max(2-.75,0)/2 + .75*1/2*.4 = 0.625+0.15 = 0.775
    //          p(c|b)=0 + .75*1/1*.2 = 0.15
    // "c d":   unseen prefix -> p = pcont(d) = 0.2 -> perplexity 5
    val score = Seq((10L, "a b c"), (11L, "c d")).toDF("doc_id", "text")
    val out = LanguageModel.scoreBigramKN(score, "text", "doc_id", c2, c1, v)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    val expectedPpl = math.exp(-(math.log(0.775) + math.log(0.15)) / 2.0)
    assert(math.abs(out(0).getDouble(3) - expectedPpl) < 5e-4, out(0).toString)
    assert(out(1).getDouble(3) == 5.0, out(1).toString)
    // the discount identity: mass over {a, b, OOV} for context `a` is
    // exactly 1 — p(b|a)=0.775, p(a|a)=0+0.375*0.4=0.15, OOV=0.375*0.2
    assert(math.abs(0.775 + 0.15 + 0.075 - 1.0) < 1e-12)
    // KN orders docs differently from add-one where continuation
    // promiscuity differs — here both smoothers must at least agree that
    // a doc of seen bigrams beats a doc of unseen ones
    assert(out(0).getDouble(3) < out(1).getDouble(3))
  }

  test("stupid-backoff trigram: every backoff leg hand-computed") {
    // train "a b c a b d": N=6, c1: a2 b2 c1 d1;
    // c2: (a,b)2 (b,c)1 (c,a)1 (b,d)1; c3: each observed trigram once
    val train = Seq((1L, "a b c a b d")).toDF("doc_id", "text")
    val score = Seq(
      (10L, "a b c"), // trigram hit: 1 / c2(a,b)=2 -> 0.5
      (11L, "b b c"), // backoff bigram: 0.4 * c2(b,c)/c1(b) = 0.4*(1/2)
      (12L, "x y d"), // backoff unigram: 0.4*0.4 * c1(d)/N = 0.16*(1/6)
      (13L, "x y z") // OOV floor: 0.4*0.4/6
    ).toDF("doc_id", "text")
    val out = LanguageModel.scoreTrigramStupidBackoff(train, score,
        "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    def ppl(s: Double) = math.rint(math.exp(-math.log(s)) * 1e4) / 1e4
    assert(out(10L) == ((1L, ppl(0.5))))
    assert(out(11L) == ((1L, ppl(0.4 * (1.0 / 2.0)))))
    assert(out(12L) == ((1L, ppl(0.4 * 0.4 * (1.0 / 6.0)))))
    assert(out(13L) == ((1L, ppl(0.4 * 0.4 / 6.0))))
    // <3-token docs score no trigrams -> no row
    val short = LanguageModel.scoreTrigramStupidBackoff(train,
      Seq((20L, "a b"), (21L, "")).toDF("doc_id", "text"), "text", "doc_id")
    assert(short.count() == 0)
  }

  test("next-token table: hand-computed argmax, probabilities, context top-k") {
    // "a b a b": bigrams (a,b),(b,a),(a,b); "a c": (a,c)
    // c2: (a,b)=2, (b,a)=1, (a,c)=1; c1: a=3, b=1
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = LanguageModel.nextTokenTopK(docs, "text", "doc_id", k = 2)
      .orderBy("w1")
      .as[(String, Long, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("a", 3L, "b", 2L, 0.666667), // argmax of {b:2, c:1}; 2/3 rounded
      ("b", 1L, "a", 1L, 1.0)))
  }

  test("pmi collocations: hand-computed values, minCount excludes rare pairs") {
    // bigrams: (a,b)x3 (b,a)x2 (b,c)x1 -> N=6
    val d = Seq((1L, "a b a b a b c")).toDF("doc_id", "text")
    val out = LanguageModel.pmiTopK(d, "text", "doc_id", minCount = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // c1 prefix: a=3 b=3; suffix: b=3 a=2 c=1
    // pmi(a,b) = ln(3*6 / (3*3)) = ln 2; pmi(b,a) = ln(2*6 / (3*2)) = ln 2
    val ln2 = BigDecimal(math.log(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(("a", "b", 3L, ln2), ("b", "a", 2L, ln2)), out.toSeq)
  }

  test("moments query matches Spark built-in stddev/covar/corr at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val ours = ReferenceQueries.moments(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val builtin = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        avg("l_quantity").as("mean_qty"),
        var_samp("l_quantity").as("var_qty"),
        stddev_samp("l_extendedprice").as("sd_price"),
        covar_samp("l_quantity", "l_extendedprice").as("covar"),
        corr("l_quantity", "l_extendedprice").as("corr"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(ours.keySet == builtin.keySet && ours.nonEmpty)
    for (flag <- ours.keySet) {
      val (o, b) = (ours(flag), builtin(flag))
      assert(o.getLong(1) == b.getLong(1))
      for ((oi, bi) <- Seq(2 -> 2, 3 -> 3, 4 -> 4, 5 -> 5, 6 -> 6)) {
        val (ov, bv) = (o.getDouble(oi), b.getDouble(bi))
        assert(math.abs(ov - bv) <= 1e-6 * math.max(1.0, math.abs(bv)),
          s"group $flag col $oi: power-sum $ov vs built-in $bv")
      }
    }
  }

  test("incremental BM25: split ingests == one-shot index bit for bit; " +
    "idempotent re-append; compact/forget/heal lifecycle") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(200).localCheckpoint(true)
    val dir = tempDir("bm25_incr")
    val terms = Seq((1L, "the"), (1L, "data"), (2L, "of"), (2L, "a"))
      .toDF("query_id", "term")
    def topk() = Retrieval.bm25TopKFromIncremental(spark, dir, terms, k = 10)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    // two ingests == a one-shot in-run index over the union, bit for bit
    // (df/N/avgdl are additive over disjoint doc sets)
    assert(Retrieval.buildBm25Incremental(
      docs.filter(col("doc_id") % 2 === 0), "text", "doc_id", dir) > 0)
    assert(Retrieval.appendBm25Incremental(spark, dir,
      docs.filter(col("doc_id") % 2 =!= 0), "text", "doc_id") > 0)
    val whole = Retrieval.bm25TopK(docs, "text", "doc_id", terms, k = 10)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(topk() == whole)
    // K2 idempotency: re-appending committed docs admits nothing
    assert(Retrieval.appendBm25Incremental(spark, dir,
      docs.filter(col("doc_id") % 2 =!= 0), "text", "doc_id") == 0L)
    assert(topk() == whole)
    // compaction folds the ingest partitions, readout unchanged
    assert(Retrieval.compactBm25Incremental(spark, dir) == (2, 1))
    assert(topk() == whole)
    assert(Retrieval.compactBm25Incremental(spark, dir) == (1, 1)) // no-op
    // crash heal: an index parked at __old by a crashed consolidation
    // heals on the next read
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__old")))
    assert(topk() == whole)
    // forget == a fresh incremental build over the survivors, bit for bit
    val victims = whole.filter(_._1 == 1L).take(3).map(_._3)
    assert(Retrieval.forgetBm25Incremental(spark, dir,
      victims.toSeq.toDF("doc_id")) == victims.length)
    val after = topk()
    assert(!after.exists(r => victims.contains(r._3)))
    val freshDir = tempDir("bm25_incr_fresh")
    Retrieval.buildBm25Incremental(
      docs.filter(!col("doc_id").isin(victims.toIndexedSeq: _*)),
      "text", "doc_id", freshDir)
    assert(after == Retrieval.bm25TopKFromIncremental(spark, freshDir, terms, 10)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq)
    // retracting everything un-commits the index
    val allIds = spark.sparkContext.parallelize(
      docs.select("doc_id").as[Long].collect().toSeq).toDF("doc_id")
    assert(Retrieval.forgetBm25Incremental(spark, dir, allIds) > 0)
    val e = intercept[IllegalArgumentException](topk())
    assert(e.getMessage.contains("meta marker absent"))
  }

  test("incremental BM25 bloom id-guard: committed docs always drop (no " +
    "false negatives), new docs admit, serve matches the exact twin, " +
    "forget's consolidation lifts the veto, missing blooms refuse") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(200).localCheckpoint(true)
    val dir = tempDir("bm25_bloom")
    val terms = Seq((1L, "the"), (1L, "data"), (2L, "of"))
      .toDF("query_id", "term")
    def topk(d: String) = Retrieval.bm25TopKFromIncremental(spark, d, terms, 10)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(Retrieval.buildBm25Incremental(
      docs.filter(col("doc_id") < 100), "text", "doc_id", dir) > 0)
    // a replay of COMMITTED docs admits nothing through the bloom — a
    // committed id always hits its own bloom (no false negatives), so
    // K2 replay idempotency is never weakened
    assert(Retrieval.appendBm25Incremental(spark, dir,
      docs.filter(col("doc_id") < 100), "text", "doc_id",
      idGuard = "bloom") == 0L)
    // new docs admit through the guard (deterministic: bloom hashing is
    // seeded, so this outcome is fixed for these ids) and the index
    // serves identically to the exact-guarded twin
    assert(Retrieval.appendBm25Incremental(spark, dir,
      docs.filter(col("doc_id") >= 100), "text", "doc_id",
      idGuard = "bloom") > 0)
    val exactTwin = tempDir("bm25_bloom_twin")
    Retrieval.buildBm25Incremental(
      docs.filter(col("doc_id") < 100), "text", "doc_id", exactTwin)
    Retrieval.appendBm25Incremental(spark, exactTwin,
      docs.filter(col("doc_id") >= 100), "text", "doc_id")
    assert(topk(dir) == topk(exactTwin))
    // forget REBUILDS the survivor bloom: the retracted doc's id must
    // not linger as a veto — it re-admits through the bloom guard
    val victim = topk(dir).head._3
    assert(Retrieval.forgetBm25Incremental(spark, dir,
      Seq(victim).toDF("doc_id")) == 1L)
    assert(Retrieval.appendBm25Incremental(spark, dir,
      docs.filter(col("doc_id") === victim), "text", "doc_id",
      idGuard = "bloom") == 1L)
    assert(topk(dir) == topk(exactTwin),
      "retract + bloom-guarded re-admit must restore the identical index")
    // an ingest with no bloom (a pre-bloom index) refuses the bloom
    // guard loudly instead of silently duplicating docs
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val blooms = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/id_bloom"))
    assert(blooms.nonEmpty)
    fs.delete(blooms.head.getPath, true)
    val e = intercept[IllegalArgumentException] {
      Retrieval.appendBm25Incremental(spark, dir,
        docs.limit(1), "text", "doc_id", idGuard = "bloom")
    }
    assert(e.getMessage.contains("no id bloom"))
    // exact mode still works on the same index (the guard is per-call)
    assert(Retrieval.appendBm25Incremental(spark, dir,
      docs.filter(col("doc_id") < 100), "text", "doc_id") == 0L)
  }

  test("bloom guard budget + pinned fpp: the uncompacted-ingest ceiling " +
    "fails with the math, compaction re-arms it, and the survivor bloom " +
    "keeps the index's pinned rate (not a hardcoded default)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(60).localCheckpoint(true)
    val dir = tempDir("bm25_budget")
    def slice(lo: Int, hi: Int) =
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
    // the first ingest PINS the index's fpp in meta
    assert(Retrieval.appendBm25Incremental(spark, dir, slice(0, 10),
      "text", "doc_id", bloomFpp = 1e-6) > 0)
    val meta = spark.read.parquet(s"$dir/meta")
    assert(meta.schema.fieldNames.contains("bloom_fpp"))
    assert(meta.head().getDouble(meta.schema.fieldIndex("bloom_fpp")) == 1e-6)
    // two more ingests (exact-guarded appends still write blooms)
    assert(Retrieval.appendBm25Incremental(spark, dir, slice(10, 20),
      "text", "doc_id") > 0)
    assert(Retrieval.appendBm25Incremental(spark, dir, slice(20, 30),
      "text", "doc_id") > 0)
    // 3 uncompacted ingests × pinned 1e-6 > budget 2e-6 → loud, with the
    // budget math and the remedy in the message
    val e = intercept[IllegalArgumentException] {
      Retrieval.appendBm25Incremental(spark, dir, slice(30, 40),
        "text", "doc_id", idGuard = "bloom", bloomBudget = 2e-6)
    }
    assert(e.getMessage.contains("bloomBudget") &&
      e.getMessage.contains("compact"))
    // compaction folds the blooms to ONE — the same budget now admits
    assert(Retrieval.compactBm25Incremental(spark, dir) == ((3, 1)))
    assert(Retrieval.appendBm25Incremental(spark, dir, slice(30, 40),
      "text", "doc_id", idGuard = "bloom", bloomBudget = 2e-6) > 0)
    // the survivor bloom was rebuilt at the PINNED 1e-6, not the old
    // hardcoded 1e-4 (r11 advice): its realized fpp reflects the rate
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val survivor = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/id_bloom"))
      .map(_.getPath).find(_.getName.startsWith("ingest=r")).get
    assert(Retrieval.readBloom(fs, survivor.toString).expectedFpp() < 1e-5,
      "consolidation must rebuild the survivor bloom at the pinned rate")
  }

  test("retraction-at-ingest: a build GATED on the takedown table is " +
    "bit-identical to build-then-forget; layout misuse fails loudly") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(200).localCheckpoint(true)
    val takedown = docs.select(col("doc_id")).filter(col("doc_id") % 7 === 3)
      .localCheckpoint(true)
    val terms = Seq((1L, "the"), (1L, "data"), (2L, "of"))
      .toDF("query_id", "term")
    def topk(d: String) = Retrieval.bm25TopKFromIncremental(spark, d, terms, 10)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    // gate the build's input: one anti-join, no index work for the
    // retracted docs, nothing ever served then un-served
    val gated = tempDir("gated_idx")
    Retrieval.buildBm25Incremental(
      docs.join(takedown, Seq("doc_id"), "left_anti"), "text", "doc_id", gated)
    // the same end state the expensive way: build on everything, forget
    val forgot = tempDir("forgot_idx")
    Retrieval.buildBm25Incremental(docs, "text", "doc_id", forgot)
    assert(Retrieval.forgetBm25Incremental(spark, forgot, takedown) ==
      takedown.count())
    assert(topk(gated) == topk(forgot),
      "gate-at-ingest and build-then-forget must serve identically")
    // cross-layout misuse is loud, both directions (a silent skip or a
    // silent 0 would lose retractions — the r10 failure class)
    val flat = tempDir("flat_idx")
    Retrieval.buildBm25Index(docs, "text", "doc_id", s"$flat/idx")
    val e1 = intercept[IllegalArgumentException] {
      Retrieval.forgetBm25Incremental(spark, s"$flat/idx",
        Seq(1L).toDF("doc_id"))
    }
    assert(e1.getMessage.contains("FLAT index"))
    val e2 = intercept[IllegalArgumentException] {
      Retrieval.appendBm25Incremental(spark, s"$flat/idx",
        docs.limit(1), "text", "doc_id")
    }
    assert(e2.getMessage.contains("FLAT index"))
    val e3 = intercept[IllegalArgumentException] {
      Retrieval.forgetBm25(spark, gated, Seq(1L).toDF("doc_id"))
    }
    assert(e3.getMessage.contains("INCREMENTAL index"))
  }
}
