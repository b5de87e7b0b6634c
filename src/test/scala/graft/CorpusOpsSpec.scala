package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, TextAnalysis}

/** Corpus-assembly operators: hash-deterministic selection (stable under
  * re-partitioning — the property df.sample lacks), mixture weighting,
  * packing invariants.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")

  test("hash sampling: identical selection under any partitioning, sane rate") {
    val a = CorpusOps.sampleByHash(docs, "doc_id", 0.25, "r2")
      .select("doc_id").as[Long].collect().toSet
    val b = CorpusOps.sampleByHash(docs.repartition(13), "doc_id", 0.25, "r2")
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    val frac = a.size.toDouble / docs.count()
    assert(math.abs(frac - 0.25) < 0.08, s"sample fraction $frac")
  }

  test("mixture weights: zero-weight sources excluded, rates tracked per key") {
    val kept = CorpusOps.mixtureSelect(docs, "doc_id", "lang",
        Map("en" -> 1.0, "es" -> 0.5), defaultWeight = 0.0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val all = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("en") == all("en")) // weight 1.0 keeps everything
    assert(!kept.contains("de") && !kept.contains("zh") && !kept.contains("fr"))
    val esRate = kept("es").toDouble / all("es")
    assert(math.abs(esRate - 0.5) < 0.2, s"es rate $esRate")
  }

  test("sequential packing: partition of the corpus, prefix-sum offsets, bins honor budget") {
    val budget = 2048
    val packed = CorpusOps.packSequential(docs, "doc_id",
      size(TextAnalysis.tokens(col("text"))), budget, blocks = 8)
      .select("doc_id", "block", "n_tokens", "stream_start", "bin_id", "bin_offset")
      .as[(Long, Long, Long, Long, Long, Long)].collect()

    assert(packed.length == docs.count()) // every doc exactly once
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._1)
      // stream_start is the prefix sum of earlier token counts in id order
      var acc = 0L
      ordered.foreach { case (_, _, tok, start, bin, off) =>
        assert(start == acc)
        assert(bin == start / budget)
        assert(off == start % budget && off < budget)
        acc += tok
      }
    }
  }

  test("stratified sample: exactly min(n, stratum size) per stratum, partition-invariant") {
    val perLang = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val got = CorpusOps.sampleStratified(docs, "doc_id", "lang", n = 30)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got.keySet == perLang.keySet)
    got.foreach { case (lang, n) => assert(n == math.min(30L, perLang(lang))) }

    val a = CorpusOps.sampleStratified(docs, "doc_id", "lang", n = 30)
      .select("doc_id").as[Long].collect().toSet
    val b = CorpusOps.sampleStratified(docs.repartition(17), "doc_id", "lang", n = 30)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("stratified sample plans through TopKPerKey, not a window sort") {
    val plan = CorpusOps.sampleStratified(docs, "doc_id", "lang", n = 30)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("temperature mixture: rare keys upsampled, partition-invariant, rate-capped") {
    val kept = CorpusOps.mixtureTemperature(docs, "doc_id", "lang",
        alpha = 0.5, targetFraction = 0.3)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val all = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    // per-key keep rates: rarer languages keep a HIGHER fraction
    val rates = all.map { case (k, n) => k -> kept.getOrElse(k, 0L).toDouble / n }
    val sorted = all.toSeq.sortBy(_._2) // by corpus count asc
    assert(rates(sorted.head._1) > rates(sorted.last._1),
      s"rarest should out-keep the most common: $rates vs counts $all")
    // overall mass near the target fraction
    val frac = kept.values.sum.toDouble / all.values.sum
    assert(math.abs(frac - 0.3) < 0.1, s"kept fraction $frac")
    // deterministic under repartitioning
    val a = CorpusOps.mixtureTemperature(docs, "doc_id", "lang", 0.5, 0.3)
      .select("doc_id").as[Long].collect().toSet
    val b = CorpusOps.mixtureTemperature(docs.repartition(11), "doc_id", "lang", 0.5, 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("domain cap: at most n per source, the highest-quality ones, via TopKPerKey") {
    val scored = TextAnalysis.quality(docs, "text", "doc_id")
      .select("doc_id", "source", "quality_score")
    val capped = CorpusOps.domainCap(scored, "doc_id", "source",
      col("quality_score"), n = 10)
    val perSource = capped.groupBy("source").count().as[(String, Long)].collect()
    assert(perSource.nonEmpty && perSource.forall(_._2 <= 10))
    // kept = the top-10 by (score desc, id asc) within each source
    val want = scored.as[(Long, String, Double)].collect().toSeq
      .groupBy(_._2).values.flatMap(_.sortBy(r => (-r._3, r._1)).take(10))
      .map(_._1).toSet
    val got = capped.select("doc_id").as[Long].collect().toSet
    assert(got == want)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey") && !plan.contains("Window"), plan)
  }

  test("stratified split: exact per-stratum quotas, disjoint+complete, partition-invariant") {
    val fr = Seq("train" -> 0.75, "validation" -> 0.125, "test" -> 0.125)
    val out = CorpusOps.splitStratified(docs, "doc_id", "lang", fr)
      .as[(Long, String, String)].collect()
    assert(out.length == docs.count()) // complete, one label per row
    val perStratum = out.groupBy(_._2)
    perStratum.foreach { case (lang, rows) =>
      val n = rows.length.toDouble
      val c = rows.groupBy(_._3).view.mapValues(_.length).toMap
      // exact ceil-quota arithmetic: train gets ceil(0.75n), validation
      // tops up to ceil(0.875n), test the remainder
      assert(c("train") == math.ceil(0.75 * n).toLong, s"$lang: $c")
      assert(c("train") + c("validation") == math.ceil(0.875 * n).toLong, s"$lang: $c")
    }
    val again = CorpusOps.splitStratified(docs.repartition(17), "doc_id", "lang", fr)
      .as[(Long, String, String)].collect()
    assert(out.toSet == again.toSet)
  }

  test("stratified split hash path: map-only, expectation-proportional, incrementally stable") {
    val fr = Seq("train" -> 0.75, "validation" -> 0.125, "test" -> 0.125)
    val fast = CorpusOps.splitStratified(docs, "doc_id", "lang", fr, exact = false)
      .as[(Long, String, String)].collect()
    val frac = fast.count(_._3 == "train").toDouble / fast.length
    assert(math.abs(frac - 0.75) < 0.05, s"train fraction $frac")
    // no shuffle: the plan has no Exchange at all
    val plan = CorpusOps.splitStratified(docs, "doc_id", "lang", fr, exact = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(600))
    // incremental stability: a row's split never changes when the corpus
    // grows (the property exact quotas cannot have)
    val sub = CorpusOps.splitStratified(docs.filter(col("doc_id") < 1000),
        "doc_id", "lang", fr, exact = false)
      .as[(Long, String, String)].collect().map(r => (r._1, r._3)).toMap
    val full = fast.map(r => (r._1, r._3)).toMap
    sub.foreach { case (id, s) => assert(full(id) == s, s"doc $id moved") }
  }

  test("curriculum: block b holds every source's rank-b doc; positions gap-free") {
    val scored = TextAnalysis.quality(docs, "text", "doc_id")
      .select("doc_id", "source", "quality_score")
    val out = CorpusOps.curriculumOrder(scored, "doc_id", "source",
        col("quality_score"))
      .orderBy("position")
      .as[(Long, String, Long, Long)].collect()
    assert(out.map(_._4).toSeq == (1L to out.length).toSeq) // gap-free total order
    val nSources = out.map(_._2).distinct.length
    // while every source still has documents, each block of |sources|
    // positions contains each source exactly once, ranks ascending
    val minCount = out.groupBy(_._2).values.map(_.length).min
    (0 until minCount).foreach { b =>
      val block = out.slice(b * nSources, (b + 1) * nSources)
      assert(block.map(_._2).distinct.length == nSources, s"block $b repeats a source")
      assert(block.forall(_._3 == b + 1), s"block $b has wrong ranks")
    }
  }

  test("curriculum: range-partitioned per-source rank ≡ window formulation, skew included") {
    // one mega-source (90% of rows) + a thin tail — the skew profile the
    // range rank exists for. Both paths must produce identical
    // (src_rank, position) for every doc, under any input partitioning.
    val skewed = docs.withColumn("source",
        when(col("doc_id") % 10 =!= 0, lit("mega"))
          .otherwise(concat(lit("s"), col("doc_id") % 7)))
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("double").as("score"))
    def run(rangeRank: Boolean, parts: Int) =
      CorpusOps.curriculumOrder(skewed.repartition(parts), "doc_id", "source",
          col("score"), rangeRank = rangeRank)
        .select("doc_id", "src_rank", "position")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val range = run(rangeRank = true, parts = 32)
    assert(range == run(rangeRank = false, parts = 32))
    assert(range == run(rangeRank = true, parts = 5)) // partition-invariant
  }

  test("rankByRangePerKey fails fast when the offset map would exceed maxOffsets") {
    // per-doc key = maximal cardinality: the (partition, key) group count
    // is ~|docs|, far past the tiny bound — the guard must fire BEFORE
    // anything collects, and its message must name the window fallback
    val perDoc = docs.select(col("doc_id"),
      concat(lit("k"), col("doc_id")).as("k"),
      length(col("text")).cast("double").as("score"))
    val e = intercept[IllegalArgumentException] {
      CorpusOps.rankByRangePerKey(perDoc, col("k"),
        Seq(col("score").desc, col("doc_id").asc), "r", maxOffsets = 10)
    }
    assert(e.getMessage.contains("rangeRank = false"))
    // the same call under the default bound succeeds (sanity: the guard
    // measures cardinality, not data size)
    val ok = CorpusOps.rankByRangePerKey(perDoc, col("k"),
      Seq(col("score").desc, col("doc_id").asc), "r")
    assert(ok.agg(max(col("r"))).head().getLong(0) == 1L) // every key unique
  }

  test("global shuffle: a permutation of 1..N, partition-invariant") {
    val n = docs.count()
    val a = CorpusOps.globalShuffle(docs, "doc_id")
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect()
    assert(a.map(_._2).sorted.toSeq == (1L to n).toSeq) // gap-free permutation
    val b = CorpusOps.globalShuffle(docs.repartition(23), "doc_id")
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect()
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    // and it actually permutes: positions don't follow id order
    val byId = a.sortBy(_._1).map(_._2)
    assert(byId.toSeq != byId.sorted.toSeq)
  }

  test("chunking: full coverage, stride overlap, reconstruction, no redundant tail") {
    val chunks = CorpusOps.chunkDocs(docs, "doc_id", "text",
        chunkTokens = 64, stride = 48)
      .as[(Long, Long, Long, String)].collect().groupBy(_._1)
    val toks = docs.select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(chunks.keySet == toks.keySet) // every doc chunked
    chunks.foreach { case (id, rows) =>
      val n = toks(id).length
      val ordered = rows.sortBy(_._2)
      // indices dense from 0; window i starts at i*stride
      assert(ordered.map(_._2).toSeq == ordered.indices.map(_.toLong))
      ordered.foreach { case (_, i, nt, text) =>
        val expect = toks(id).slice((i * 48).toInt, (i * 48).toInt + 64)
        assert(text == expect.mkString(" ") && nt == expect.length)
      }
      // coverage: last window reaches the end; no window starts past it
      val last = ordered.last
      assert(last._2 * 48 + last._3 == n)
      assert(n <= 64 || (last._2 - 1) * 48 + 64 < n) // predecessor didn't already cover
    }
  }

  test("weighted sampling: without replacement, partition-invariant, weight-biased") {
    val k = 200
    val a = CorpusOps.sampleWeighted(docs, "doc_id", col("n_chars"), k)
      .select("doc_id").as[Long].collect().toSet
    assert(a.size == k) // without replacement: k distinct rows
    val b = CorpusOps.sampleWeighted(docs.repartition(17), "doc_id", col("n_chars"), k)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b) // deterministic under any partitioning
    // biased toward weight: sampled docs are longer on average than corpus
    val meanAll = docs.agg(avg("n_chars")).head().getDouble(0)
    val meanSample = docs.filter(col("doc_id").isInCollection(a))
      .agg(avg("n_chars")).head().getDouble(0)
    assert(meanSample > meanAll,
      s"weighted sample mean $meanSample should exceed corpus mean $meanAll")
  }

  test("budget selection: maximal quality-order prefix within budget, partition-invariant") {
    val budget = 20000L
    val q = TextAnalysis.quality(docs, "text", "doc_id")
      .select("doc_id", "n_tokens", "quality_score")
    val sel = CorpusOps.selectByBudget(q, "doc_id", col("quality_score"),
        col("n_tokens"), budget)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(sel.map(_._2).sum <= budget)
    // the selection is exactly the maximal prefix of (score desc, id) order
    val all = q.as[(Long, Long, Double)].collect()
      .sortBy { case (id, _, s) => (-s, id) }
    val prefix = all.scanLeft(0L)(_ + _._2).tail.zip(all)
      .takeWhile(_._1 <= budget).map(_._2)
    assert(sel == prefix.sortBy(_._1).toSeq)
    assert(prefix.length < all.length) // the budget actually binds
    // same selection from any input partitioning
    val sel2 = CorpusOps.selectByBudget(q.repartition(19), "doc_id",
        col("quality_score"), col("n_tokens"), budget)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(sel2 == sel)
  }

  test("length buckets: masses add up") {
    val total = docs.count()
    val tokens = docs.select(size(TextAnalysis.tokens(col("text"))).cast("long"))
      .as[Long].collect().sum
    val buckets = CorpusOps.lengthBuckets(docs, "doc_id",
      size(TextAnalysis.tokens(col("text")))).as[(Long, Long, Long)].collect()
    assert(buckets.map(_._2).sum == total)
    assert(buckets.map(_._3).sum == tokens)
  }
}
