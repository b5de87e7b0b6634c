package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** The distributed BPE trainer pinned word-for-word against a local
  * in-memory reference implementation (the formulation every tokenizer
  * library uses): same weighted pair counts, same (weight desc, pair asc)
  * tie-break, same left-to-right non-overlapping merge scan.
  */
class BpeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Reference BPE on a driver-local word-frequency map. */
  private def localBpe(wordCounts: Map[String, Long], numMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Seq[String], Long] = wordCounts.map { case (w, c) =>
      (w.map(_.toString) :+ Bpe.EndOfWord, c)
    }
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 0 until numMerges) {
      val pairs = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (pairs.nonEmpty) {
        val ((a, b), pw) = pairs.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((a, b, pw))
        vocab = vocab.groupMapReduce { case (syms, _) => Bpe.mergePair(syms, a, b) }(_._2)(_ + _)
      }
    }
    out.result()
  }

  private def wordCounts: Map[String, Long] =
    Tables.load(spark, sf, "documents")
      .select(explode(split(lower(trim(col("text"))), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("distributed merge sequence equals the local reference, 24 merges") {
    val dist = Bpe.train(Tables.load(spark, sf, "documents"), "text", 24)
      .map(m => (m.left, m.right, m.pairCount))
    val local = localBpe(wordCounts, 24)
    assert(dist == local, s"\ndist : $dist\nlocal: $local")
  }

  test("encode: subword count equals chars+words minus merge applications per doc") {
    val d = Tables.load(spark, sf, "documents").limit(50)
    val merges = Bpe.train(d, "text", 8)
    val enc = Bpe.encode(d, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // local re-encode of one doc must agree exactly
    val rows = d.select("doc_id", "text").collect()
    rows.take(5).foreach { r =>
      val words = r.getString(1).trim.toLowerCase.split(" ").filter(_.nonEmpty)
      var nSub = 0L
      words.foreach { w =>
        var syms: Seq[String] = w.map(_.toString) :+ Bpe.EndOfWord
        merges.foreach(m => syms = Bpe.mergePair(syms, m.left, m.right))
        nSub += syms.length
      }
      assert(enc(r.getLong(0)) == ((words.length.toLong, nSub)), s"doc ${r.getLong(0)}")
    }
    // every subword count is bounded by the unmerged length (chars + EOW)
    enc.values.foreach { case (nw, ns) => assert(ns >= nw) }
  }

  test("encodeIds + packTokens: blocks are exact, ordered, and round-trip") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents").limit(60)
    val merges = Bpe.train(docs, "text", numMerges = 8)
    val (ids, vocab) = Bpe.encodeIds(docs, "text", "doc_id", merges)
    assert(vocab.nonEmpty && vocab.sameElements(vocab.sorted))
    // id range valid
    val mx = ids.select(max(array_max(col("token_ids")))).head().getInt(0)
    assert(mx < vocab.length)
    val packed = graft.operators.CorpusOps.packTokens(
      ids, "doc_id", "token_ids", blockSize = 128, blocks = 4)
      .collect()
    // every non-final block of a stream holds exactly blockSize tokens
    val byStream = packed.groupBy(_.getLong(0))
    byStream.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      sorted.dropRight(1).foreach(r => assert(r.getLong(2) == 128L, r))
      assert(sorted.map(_.getLong(2)).sum ==
        sorted.flatMap(_.getSeq[Int](3)).length)
    }
    // round-trip: per-stream concatenation of blocks == concatenation of
    // that stream's docs in id order
    val streamOf = ids.select(col("doc_id"), col("token_ids")).collect().map { r =>
      val id = r.getLong(0)
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"b:$id".getBytes("US-ASCII"))
      val h24 = ((h(0) & 0xFFL) << 16) | ((h(1) & 0xFFL) << 8) | (h(2) & 0xFFL)
      (h24 % 4, id, r.getSeq[Int](1))
    }
    streamOf.groupBy(_._1).foreach { case (s, docRows) =>
      val expected = docRows.sortBy(_._2).flatMap(_._3).toSeq
      val got = byStream(s).sortBy(_.getLong(1)).flatMap(_.getSeq[Int](3)).toSeq
      assert(got == expected, s"stream $s")
    }
  }

  test("encode tokenization mirrors training: space-only split, no Java trim") {
    import spark.implicits._
    // Java String.trim would strip the tab/newline edges and toLowerCase
    // would use the JVM default locale; training (split(lower(trim)), " "))
    // keeps them inside tokens. Both paths must see the SAME words.
    val d = Seq((1L, "\tHELLO  world\n")).toDF("doc_id", "text")
    val enc = Bpe.encode(d, "text", "doc_id", merges = Seq.empty).head()
    // training tokens: ["\thello", "world\n"] -> 2 words; with no merges
    // each word contributes chars + 1 (the </w> sentinel) subwords
    assert(enc.getLong(1) == 2L, s"n_words ${enc.getLong(1)}")
    assert(enc.getLong(2) == ("\thello".length + 1 + "world\n".length + 1).toLong,
      s"n_subwords ${enc.getLong(2)}")
    // and the id-encode path tokenizes identically
    val (ids, vocab) = Bpe.encodeIds(d, "text", "doc_id", Seq.empty)
    val idSeq = ids.select(col("token_ids")).as[Seq[Int]].head()
    assert(idSeq.length == enc.getLong(2).toInt)
    assert(vocab.contains("\t") && vocab.contains("\n")) // edges survived
  }

  test("merges are deterministic under repartitioning") {
    val d = Tables.load(spark, sf, "documents")
    val a = Bpe.train(d.repartition(2), "text", 6)
    val b = Bpe.train(d.repartition(11), "text", 6)
    assert(a == b)
  }
}
