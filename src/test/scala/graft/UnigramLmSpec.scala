package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.operators.UnigramLm

/** The distributed unigram-LM (Viterbi-EM) trainer pinned against a
  * local in-memory reference implementation: same weighted substring
  * seed, same fixed-point scores, same DP tie-breaks, same prune rule.
  */
class UnigramLmSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def wordCounts: Map[String, Long] =
    Tables.load(spark, sf, "documents")
      .select(explode(split(lower(trim(col("text"))), " ")).as("w"))
      .filter(length(col("w")) > 0 && length(col("w")) <= UnigramLm.MaxWordLen)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Driver-local reference trainer — the plain formulation, no Spark. */
  private def localTrain(words: Map[String, Long], maxPieceLen: Int,
                         seedMulti: Int, keepMulti: Int,
                         iters: Int): Seq[UnigramLm.Piece] = {
    def rescore(kept: Seq[(String, Long)]): Seq[UnigramLm.Piece] = {
      val t = kept.map(_._2).sum
      val k = kept.size
      kept.map { case (p, n) =>
        UnigramLm.Piece(p, n,
          math.floor(math.log((n + 1).toDouble / (t + k).toDouble) * (1L << 20)).toLong)
      }
    }
    val subCnt = mutable.HashMap.empty[String, Long]
    words.foreach { case (w, c) =>
      for (s <- 0 until w.length; e <- (s + 1) to math.min(s + maxPieceLen, w.length))
        subCnt(w.substring(s, e)) = subCnt.getOrElse(w.substring(s, e), 0L) + c
    }
    val chars = subCnt.filter(_._1.length == 1).toSeq
    val multi = subCnt.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(seedMulti)
    var pieces = rescore(chars ++ multi)
    for (_ <- 0 until iters) {
      val scores = pieces.map(p => p.piece -> p.score).toMap
      val cnt = mutable.HashMap.empty[String, Long]
      words.foreach { case (w, c) =>
        UnigramLm.segment(w, scores, maxPieceLen).foreach(p =>
          cnt(p) = cnt.getOrElse(p, 0L) + c)
      }
      val keptChars = pieces.collect {
        case UnigramLm.Piece(p, _, _) if p.length == 1 => p -> cnt.getOrElse(p, 0L)
      }
      val keptMulti = cnt.toSeq.filter { case (p, n) => p.length >= 2 && n > 0 }
        .sortBy { case (p, n) => (-n, p) }.take(keepMulti)
      pieces = rescore(keptChars ++ keptMulti)
    }
    pieces.sortBy(_.piece)
  }

  test("distributed piece table equals the local reference") {
    val dist = UnigramLm.train(Tables.load(spark, sf, "documents"), "text",
      maxPieceLen = 6, seedMulti = 50, keepMulti = 30, iters = 2)
    val local = localTrain(wordCounts, 6, 50, 30, 2)
    assert(dist == local, s"\ndist : $dist\nlocal: $local")
    // all chars survive pruning; multi-char stays within budget
    assert(dist.count(_.piece.length >= 2) <= 30)
    val allChars = wordCounts.keys.flatMap(_.map(_.toString)).toSet
    assert(allChars.subsetOf(dist.filter(_.piece.length == 1).map(_.piece).toSet))
  }

  test("round-trip: every segmentation concatenates back to its word") {
    val pieces = UnigramLm.train(Tables.load(spark, sf, "documents"), "text")
    val scores = pieces.map(p => p.piece -> p.score).toMap
    wordCounts.keys.foreach { w =>
      val seg = UnigramLm.segment(w, scores, maxPieceLen = 6)
      assert(seg.mkString == w, s"$w -> $seg")
      assert(seg.forall(p => scores.contains(p)), s"$w -> $seg has non-pieces")
    }
  }

  test("segment: UNK char fallback and long-word fallback still round-trip") {
    val scores = Map("a" -> -1000L, "ab" -> -500L, "b" -> -1200L)
    // 'z' is no piece: falls back to a single UNK char step
    assert(UnigramLm.segment("azb", scores, 6) == Seq("a", "z", "b"))
    // the UNK penalty must not be preferred over a real segmentation
    assert(UnigramLm.segment("ab", scores, 6) == Seq("ab"))
    // words beyond MaxWordLen segment per-char (the SQL-oracle bound)
    val long = "a" * (UnigramLm.MaxWordLen + 3)
    assert(UnigramLm.segment(long, scores, 6) == long.map(_.toString))
    // empty word: empty segmentation
    assert(UnigramLm.segment("", scores, 6).isEmpty)
  }

  test("segment: DP tie-breaks prefer higher score, then fewer pieces, then longer tail") {
    // equal-score paths: "abc" as [ab, c] (2 pieces) vs [a, b, c] (3) —
    // scores rigged so both total -300: fewer pieces must win
    val s1 = Map("a" -> -100L, "b" -> -100L, "c" -> -100L, "ab" -> -200L)
    assert(UnigramLm.segment("abc", s1, 6) == Seq("ab", "c"))
    // equal score AND equal piece count: [a, bc] vs [ab, c] — start asc
    // on the FINAL position means the longer last piece ([a, bc]) wins
    val s2 = Map("a" -> -100L, "b" -> -100L, "c" -> -100L,
      "ab" -> -150L, "bc" -> -150L)
    assert(UnigramLm.segment("abc", s2, 6) == Seq("a", "bc"))
  }

  test("training is deterministic under repartitioning") {
    val d = Tables.load(spark, sf, "documents")
    val a = UnigramLm.train(d.repartition(2), "text", iters = 1)
    val b = UnigramLm.train(d.repartition(11), "text", iters = 1)
    assert(a == b)
  }

  test("encode agrees with a local re-encode; empty docs are (0, 0)") {
    import spark.implicits._
    val d = Tables.load(spark, sf, "documents").limit(50)
    val pieces = UnigramLm.train(d, "text")
    val scores = pieces.map(p => p.piece -> p.score).toMap
    val enc = UnigramLm.encode(d, "text", "doc_id", pieces)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    d.select("doc_id", "text").collect().take(5).foreach { r =>
      val words = r.getString(1).toLowerCase(java.util.Locale.ROOT)
        .split(" ").filter(_.nonEmpty)
      val np = words.map(w => UnigramLm.segment(w, scores, 6).length.toLong).sum
      assert(enc(r.getLong(0)) == ((words.length.toLong, np)), s"doc ${r.getLong(0)}")
    }
    val empty = Seq((99L, "")).toDF("doc_id", "text")
    val e = UnigramLm.encode(empty, "text", "doc_id", pieces).head()
    assert(e.getLong(1) == 0L && e.getLong(2) == 0L)
  }

  test("encodeIds: sorted vocab, in-range ids, decode round-trips the token stream") {
    import spark.implicits._
    val d = Tables.load(spark, sf, "documents")
    // sample-trained pieces, full-corpus encode — the pack query's split
    val pieces = UnigramLm.train(d.filter(col("doc_id") % 4 === 0), "text")
    val (ids, vocab) = UnigramLm.encodeIds(d, "text", "doc_id", pieces)
    assert(vocab.nonEmpty && vocab.sameElements(vocab.sorted))
    val mx = ids.select(max(array_max(col("token_ids")))).head().getInt(0)
    assert(mx < vocab.length)
    // decode: per-doc id stream maps back to pieces whose concatenation
    // equals the doc's normalized word stream
    val back = ids.as[(Long, Seq[Int])].collect().toMap
    d.select("doc_id", "text").collect().take(10).foreach { r =>
      val words = r.getString(1).toLowerCase(java.util.Locale.ROOT)
        .split(" ").filter(_.nonEmpty)
      assert(back(r.getLong(0)).map(vocab).mkString == words.mkString,
        s"doc ${r.getLong(0)}")
    }
    // a char the training sample never saw still encodes (UNK fallback
    // char lands in the vocabulary as itself)
    val odd = Seq((7777L, "zqф zz")).toDF("doc_id", "text")
    val (ids2, vocab2) = UnigramLm.encodeIds(odd, "text", "doc_id", pieces)
    val stream = ids2.as[(Long, Seq[Int])].head()._2.map(vocab2)
    assert(stream.mkString == "zqфzz")
    assert(vocab2.contains("ф"))
  }

  test("encode plan is map-only: no Exchange between the scan and the result") {
    val d = Tables.load(spark, sf, "documents")
    val pieces = UnigramLm.train(d, "text", iters = 1)
    val plan = UnigramLm.encode(d, "text", "doc_id", pieces)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(600))
  }

  test("fixture guard: no document word exceeds MaxWordLen (oracle exactness bound)") {
    for (sfDir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = Tables.load(spark, s"/root/testdata/$sfDir", "documents")
      val long = docs
        .select(explode(split(lower(trim(col("text"))), " ")).as("w"))
        .filter(length(col("w")) > UnigramLm.MaxWordLen).count()
      assert(long == 0,
        s"$sfDir has $long words beyond MaxWordLen — the unigram oracles stop being exact")
    }
  }
}
