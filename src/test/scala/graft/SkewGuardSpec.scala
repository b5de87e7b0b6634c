package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Adversarial duplicate-heavy corpora — the normal case for dedup at
  * corpus scale. A mega-cluster of identical documents/vectors lands in
  * one LSH bucket of every table; the bucket-population caps must exclude
  * it from the quadratic candidate self-join (exact dedup owns identical
  * content) while pairs in sane buckets are still found.
  */
class SkewGuardSpec extends SparkSpec {
  import spark.implicits._

  private val megaN = 500

  test("simhash: mega-cluster blocks dropped, sane identical pair kept") {
    val mega = (0 until megaN).map(i =>
      (1000L + i, "zeta ion flux warp core dilithium plasma conduit phaser array deck"))
    val sane = Seq(
      (10L, "one two three four five six seven eight nine ten eleven twelve"),
      (11L, "one two three four five six seven eight nine ten eleven twelve"),
      (20L, "red orange yellow green blue indigo violet cyan magenta white black gray"))
    val corpus = (sane ++ mega).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(corpus, "text", "doc_id",
        maxHamming = 3, maxBucket = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 11L)), s"sane pair lost: $pairs")
    assert(!pairs.exists(p => p._1 >= 1000L && p._2 >= 1000L),
      "mega-cluster pairs must be excluded by the bucket cap")
  }

  test("embedding near-dup: hot buckets dropped, sane near-dup pair kept") {
    def vec(axis: Int, eps: Float): Array[Float] =
      Array.tabulate(8)(i => (if (i == axis) 1.0f else 0.0f) + (if (i == 7) eps else 0.0f))
    val mega = (0 until megaN).map(i => (1000L + i, vec(0, 0f)))
    val sane = Seq((10L, vec(3, 0.01f)), (11L, vec(3, 0.02f)), (20L, vec(5, 0f)))
    val corpus = (sane ++ mega).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(corpus, "embedding", "vec_id",
        threshold = 0.9, bits = 4, tables = 4, maxBucket = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 11L)), s"sane near-dup lost: $pairs")
    assert(!pairs.exists(p => p._1 >= 1000L && p._2 >= 1000L),
      "mega-cluster pairs must be excluded by the bucket cap")
  }

  test("srp top-k: query still resolves neighbors with the pile's buckets dropped") {
    def vec(axis: Int, eps: Float): Array[Float] =
      Array.tabulate(8)(i => (if (i == axis) 1.0f else 0.0f) + (if (i == 7) eps else 0.0f))
    val mega = (0 until megaN).map(i => (1000L + i, vec(0, 0f)))
    val sane = Seq((10L, vec(3, 0.01f)), (11L, vec(3, 0.02f)), (20L, vec(5, 0f)))
    val corpus = (sane ++ mega).toDF("vec_id", "embedding")
    val queries = Seq((10L, vec(3, 0.01f))).toDF("vec_id", "embedding")
    val top = Similarity.srpTopK(corpus, queries, "embedding", "vec_id",
        k = 1, bits = 4, tables = 4, maxBucket = 100)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(top.toSeq == Seq((10L, 11L)), s"expected the planted neighbor: ${top.toSeq}")
  }

  test("caps do not change results when no bucket is hot") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      (2L, "one two three four five six seven eight nine ten eleven twelve"),
      (3L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3, maxBucket = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val loose = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3, maxBucket = 1000000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == loose)
  }
}
