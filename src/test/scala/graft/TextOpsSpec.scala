package graft

import graft.operators.{Decontam, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repetition metrics, PII redaction, and benchmark decontamination on
  * hand-computed fixtures (the corpus-level checks live in the oracle).
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetition: hand-computed bigram fractions; <2-token docs excluded") {
    val df = Seq(
      (1L, "a b a b a b"), // bigrams: [a b]x3 [b a]x2 -> top 3/5, dup 5/5
      (2L, "x y z w"),     // 3 distinct bigrams, no repeats
      (3L, "solo")         // no bigrams
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(df, "text", "doc_id").orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect()
    assert(r.toSeq == Seq((1L, 5L, 0.6, 1.0), (2L, 3L, 0.333333, 0.0)))
  }

  test("removeBoilerplateLines: df-hot lines dropped per group, order kept, empty docs survive") {
    // header repeated in all 3 docs of source s1 (df 3 >= minDf 3);
    // body lines unique; doc 4 in s2 keeps its copy of the same header
    // (df 1 there); doc 5 is ALL boilerplate -> survives as empty text
    val df = Seq(
      (1L, "s1", "hdr\nalpha\nbeta"),
      (2L, "s1", "hdr\ngamma"),
      (3L, "s1", "hdr\ndelta\nhdr"),
      (4L, "s2", "hdr\nepsilon"),
      (5L, "s1", "hdr")
    ).toDF("doc_id", "source", "text")
    val r = TextAnalysis.removeBoilerplateLines(df, "text", "doc_id", "source", minDf = 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(r == Seq((1L, "alpha\nbeta"), (2L, "gamma"), (3L, "delta"),
      (4L, "hdr\nepsilon"), (5L, "")))
  }

  test("redactPii: counts on original text, typed placeholders in output") {
    val df = Seq(
      (1L, "mail bob@x.io or +1 555-123-4567 via 192.168.0.1 ok"),
      (2L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df, "text", "doc_id").orderBy("doc_id")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(r(0) == ((1L, 1L, 1L, 1L, "mail <EMAIL> or <PHONE> via <IP> ok")))
    assert(r(1) == ((2L, 0L, 0L, 0L, "nothing sensitive here")))
  }

  test("decontaminate: shared 8-gram flags the doc; disjoint corpus clean") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog entirely"),
      (11L, "completely different words nothing shared here at all okay")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (90L, "quick brown fox jumps over the lazy dog") // = one corpus 8-gram
    ).toDF("doc_id", "text")
    for (portable <- Seq(false, true)) {
      val r = Decontam.overlap(corpus, bench, "text", "doc_id",
          k = 8, portable = portable)
        .as[(Long, Long, Long)].collect()
      assert(r.toSeq == Seq((10L, 1L, 1L)), s"portable=$portable")
    }
    val clean = Decontam.overlap(corpus.filter($"doc_id" === 11L), bench,
      "text", "doc_id", k = 8)
    assert(clean.isEmpty)
    // shuffle-join fallback (corpus-sized bench) agrees with broadcast
    val shuffled = Decontam.overlap(corpus, bench, "text", "doc_id",
      k = 8, broadcastBench = false).as[(Long, Long, Long)].collect()
    assert(shuffled.toSeq == Seq((10L, 1L, 1L)))
  }

  test("contamination score: fractions of shared shingles, clean docs at 0") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog entirely"), // 3 shingles, 1 shared
      (11L, "completely different words nothing shared here at all okay")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (90L, "quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val r = Decontam.contaminationScore(corpus, bench, "text", "doc_id", k = 8)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    // doc 10: 10 tokens -> 3 distinct 8-grams, one matches bench;
    // doc 11: 9 tokens -> 2 distinct 8-grams, none match
    assert(r == Seq((10L, 3L, 1L, 0.333333), (11L, 2L, 0L, 0.0)), r)
    // agrees with overlap(): every doc overlap() reports shares >= 1 shingle
    val flagged = Decontam.overlap(corpus, bench, "text", "doc_id", k = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(r.filter(_._3 > 0).map(_._1).toSet == flagged)
  }

  test("bloom-prefiltered decontamination: identical output, map-side probe in plan") {
    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter($"doc_id" % 10 =!= 0)
    val bench = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter($"doc_id" % 10 === 0)
    val plain = Decontam.overlap(corpus, bench, "text", "doc_id", k = 8)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    for (bcast <- Seq(true, false)) {
      val df = Decontam.overlapBloom(corpus, bench, "text", "doc_id",
        k = 8, broadcastBench = bcast)
      assert(df.orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq == plain,
        s"broadcastBench=$bcast")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"), s"bloom probe missing: $p")
    }
    // fpp=0 corner: a bloom of ~zero distinct items must not crash
    val tiny = Decontam.overlapBloom(corpus.limit(3), bench.limit(1),
      "text", "doc_id", k = 8)
    tiny.collect() // just runs
  }

  test("corpus datasheet: hand-computed metrics on a constructed corpus") {
    val df = Seq(
      (1L, "the quick brown fox jumps", "en", "a"),
      (2L, "the quick brown fox jumps", "en", "b"), // exact dup of 1
      (3L, "contact me bob@x.io today", "en", "a"), // carries PII
      (4L, "uno dos tres cuatro", "es", "c")
    ).toDF("doc_id", "text", "lang", "source")
    val m = graft.operators.CorpusReport.datasheet(df, "text", "doc_id",
        "lang", "source")
      .as[(String, Double)].collect().toMap
    assert(m.size == 9)
    assert(m("n_docs") == 4.0)
    assert(m("n_langs") == 2.0 && m("n_sources") == 3.0)
    assert(m("exact_dup_rate") == 0.25) // one duplicated text of four
    assert(m("pii_doc_rate") == 0.25)   // the email doc
    assert(m("n_chars_total") == 94.0)
    assert(m("n_tokens_total") == 18.0) // 5 + 5 + 4 + 4
    assert(m("mean_tokens_per_doc") == 4.5)
    assert(m("mean_quality") > 0.0 && m("mean_quality") <= 1.0)
    // one corpus pass: both featurizers are map-only projections chained
    // over one scan — no per-doc join anywhere in the plan
    val plan = graft.operators.CorpusReport.datasheet(df, "text", "doc_id",
      "lang", "source").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(800))
  }

  test("datasheet sketches: per-drop persist + merge ≡ whole-corpus datasheet") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val drops = Seq(
      docs.filter($"doc_id" % 3 === 0),
      docs.filter($"doc_id" % 3 === 1),
      docs.filter($"doc_id" % 3 === 2))
    val store = tempDir("dssketch")
    drops.zipWithIndex.foreach { case (d, i) =>
      graft.operators.CorpusReport.datasheetSketch(d, "text", "doc_id",
        "lang", "source").write.parquet(s"$store/drop=$i")
    }
    val partials = (0 until 3).map(i => spark.read.parquet(s"$store/drop=$i"))
      .reduce(_ unionByName _)
    val merged = graft.operators.CorpusReport.datasheetFromSketches(partials)
      .as[(String, Double)].collect().toMap
    val whole = graft.operators.CorpusReport.datasheet(docs, "text", "doc_id",
        "lang", "source")
      .as[(String, Double)].collect().toMap
    assert(merged.keySet == whole.keySet)
    // exact-mergeable metrics are BIT-equal — including mean_quality,
    // whose fixed-point decimal sum re-associates without float error
    for (k <- Seq("n_docs", "n_chars_total", "n_tokens_total",
        "mean_quality", "pii_doc_rate", "mean_tokens_per_doc"))
      assert(merged(k) == whole(k), s"$k: ${merged(k)} vs ${whole(k)}")
    // distinct-backed metrics: HLL estimates within 2% (tiny
    // cardinalities here are exact in the sketch's sparse mode)
    for (k <- Seq("n_langs", "n_sources", "exact_dup_rate"))
      assert(math.abs(merged(k) - whole(k)) <= 0.02 * math.max(1.0, whole(k)),
        s"$k: ${merged(k)} vs ${whole(k)}")
  }

  test("persisted bench artifact: identical decontamination, reusable across runs") {
    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter($"doc_id" % 10 =!= 0)
    val bench = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter($"doc_id" % 10 === 0)
    val plain = Decontam.overlap(corpus, bench, "text", "doc_id", k = 8)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val art = tempDir("benchart")
    Decontam.buildBenchArtifact(bench, "text", "doc_id", art, k = 8)
    // two independent query runs from the SAME artifact — the bench side
    // is read, never recomputed, and results match the in-memory path
    (1 to 2).foreach { run =>
      val r = Decontam.overlapPersisted(corpus, art, "text", "doc_id", k = 8)
        .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
      assert(r == plain, s"run $run diverged")
    }
    // the bloom probe is in the plan (map-side prefilter before the join)
    val p = Decontam.overlapPersisted(corpus, art, "text", "doc_id", k = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p.take(800))
  }

  test("c4LineFilter: every rule exercised; page gates on brace/phrase/zero-kept") {
    val df = Seq(
      (1L, "good line with words.\nclick here\nanother proper line!"), // 2 kept
      (2L, "please enable JavaScript to continue.\nfine line here."),  // js dropped (case-folded)
      (3L, "if (x) { return 0; }\nreal sentence stays here."),         // brace -> page drop
      (4L, "lorem ipsum dolor sit amet.\nok."),                        // phrase -> page drop; 'ok.' too short
      (5L, "no terminal punctuation at all\nshort."),                  // nothing kept -> page drop
      (6L, "")                                                         // empty
    ).toDF("doc_id", "text")
    val r = TextAnalysis.c4LineFilter(df, "text", "doc_id").orderBy("doc_id")
      .select("doc_id", "n_lines", "n_kept", "clean_text", "keep_page")
      .as[(Long, Long, Long, String, Boolean)].collect().toSeq
    assert(r == Seq(
      (1L, 3L, 2L, "good line with words.\nanother proper line!", true),
      (2L, 2L, 1L, "fine line here.", true),
      (3L, 2L, 1L, "real sentence stays here.", false),
      (4L, 2L, 1L, "lorem ipsum dolor sit amet.", false),
      (5L, 2L, 0L, "", false),
      (6L, 1L, 0L, "", false)))
  }

  test("htmlToText: blocks, comments, tags, entities, corrupt html are data") {
    val df = Seq(
      (1L, "<body><h1>Hi</h1><script>if(a<2){b=3}</script><p>x &amp; y</p></body>"),
      (2L, "<div>double &amp;lt; stays escaped</div><!-- gone -->"),
      (3L, "plain text, no markup at all"),
      (4L, "<p>unclosed tag <b>bold text"), // corrupt html is data, not a failure
      (5L, "a&nbsp;&quot;b&quot;&#39;c&#39; &lt;tag&gt;")
    ).toDF("doc_id", "text")
    val r = df.select($"doc_id", TextAnalysis.htmlToText($"text").as("t"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(r == Seq(
      (1L, "Hi x & y"),
      (2L, "double &lt; stays escaped"), // &amp; decoded LAST: one escape level only
      (3L, "plain text, no markup at all"),
      (4L, "unclosed tag bold text"),
      (5L, "a \"b\"'c' <tag>")))
  }

  test("charStats: closed-form entropy/simpson/top-frac; empty text zeros") {
    val df = Seq((1L, "aab"), (2L, "aaaa"), (3L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.charStats(df, "text", "doc_id").orderBy("doc_id")
      .select("doc_id", "n_chars", "n_distinct_chars", "top_char_frac",
        "char_simpson", "char_entropy")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    // "aab": p=(2/3,1/3) -> top 0.666667, simpson 1-5/9=0.444444,
    // H=-(2/3 ln 2/3 + 1/3 ln 1/3)=0.636514
    assert(r(0) == ((1L, 3L, 2L, 0.666667, 0.444444, 0.636514)))
    assert(r(1) == ((2L, 4L, 1L, 1.0, 0.0, 0.0)))
    assert(r(2) == ((3L, 0L, 0L, 0.0, 0.0, 0.0)))
  }

  test("charStats: native one-pass expression is bit-identical to the " +
    "O(alphabet x len) HOF formulation it replaced") {
    // the old column formulation, verbatim (the r8 board's oracle-matched
    // shape): per-distinct-char re-scan, folds in array_sort order —
    // the native CharDistStats must reproduce every double bit-for-bit
    def oldStats(df: DataFrame): DataFrame = {
      val chars = filter(split($"text", ""), x => x =!= "")
      val n = size(chars).cast("double")
      val counts = transform(array_sort(array_distinct(chars)),
        c => size(filter(chars, x => x === c)).cast("double"))
      val simpson = lit(1.0) - aggregate(counts, lit(0.0),
        (acc, c) => acc + (c / n) * (c / n))
      val entropy = lit(0.0) - aggregate(counts, lit(0.0),
        (acc, c) => acc + (c / n) * log(c / n))
      df.withColumn("n_chars", length($"text").cast("long"))
        .withColumn("n_distinct_chars", size(array_distinct(chars)).cast("long"))
        .withColumn("top_char_frac",
          when($"n_chars" === 0, lit(0.0)).otherwise(round(array_max(counts) / n, 6)))
        .withColumn("char_simpson",
          when($"n_chars" === 0, lit(0.0)).otherwise(round(simpson, 6)))
        .withColumn("char_entropy",
          when($"n_chars" === 0, lit(0.0)).otherwise(round(entropy, 6)))
    }
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaabbbbcccdde"),
      (3L, "naïve café — déjà vu; ünïcödé mix 123!?"),
      (4L, "    \n\t whitespace   heavy \n\n doc   "),
      (5L, "ABCabc!@#$%^&*()[]{};:'\",.<>/?\\|`~-_=+"),
      (6L, ""),
      (7L, "𝕏 astral 𝄞 plane 🚀 chars 𝕏𝕏"),
      (8L, "base64ish QWxhZGRpbjpvcGVuIHNlc2FtZQ== blob"))
      .toDF("doc_id", "text")
    val cols = Seq("doc_id", "n_chars", "n_distinct_chars", "top_char_frac",
      "char_simpson", "char_entropy")
    val neu = TextAnalysis.charStats(docs, "text", "doc_id")
      .select(cols.map(col): _*).orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    val old = oldStats(docs)
      .select(cols.map(col): _*).orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(neu == old)
  }
}
