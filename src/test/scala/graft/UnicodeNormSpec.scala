package graft

import org.apache.spark.sql.functions._

import graft.functions.{nfc_normalize, nfkc_normalize}
import graft.operators.Dedup

/** Unicode normalization expressions: UAX #15 semantics on the canonical
  * trap cases (escapes spelled explicitly — source encoding must not
  * decide what the fixture is), and the end-to-end reason the pass
  * exists — byte-keyed dedup only sees canonicalized duplicates.
  */
class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "caf\u00e9"   // \u00e9 as one code point (NFC)
  private val decomposed = "cafe\u0301" // e + combining acute

  test("NFC composes decomposed sequences; NFKC folds compatibility forms") {
    val df = Seq(
      (1L, composed),
      (2L, decomposed),
      (3L, "\ufb01le"),                // fi ligature
      (4L, "\uff21\uff22\uff23"),      // full-width ABC
      (5L, "plain ascii")
    ).toDF("id", "t")
    val r = df.select(col("id"), nfc_normalize(col("t")).as("nfc"),
        nfkc_normalize(col("t")).as("nfkc"))
      .orderBy("id").as[(Long, String, String)].collect()
    assert(r(0)._2 == composed && r(1)._2 == composed) // both canonical now
    assert(r(2)._2 == "\ufb01le") // NFC keeps compatibility chars
    assert(r(2)._3 == "file")       // NFKC folds the ligature
    assert(r(3)._3 == "ABC")        // NFKC folds full-width
    assert(r(4)._2 == "plain ascii" && r(4)._3 == "plain ascii")
  }

  test("registered SQL surface + null passthrough + idempotence") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT nfc_normalize('cafe\u0301'), nfkc_normalize('\ufb01le'), " +
        "nfc_normalize(CAST(NULL AS STRING))")
      .head()
    assert(out.getString(0) == composed)
    assert(out.getString(1) == "file")
    assert(out.isNullAt(2))
    // idempotent: normalizing twice changes nothing
    val t = Seq(decomposed + " \ufb01").toDF("t")
    val once = t.select(nfkc_normalize(col("t"))).head().getString(0)
    val twice = t.select(nfkc_normalize(nfkc_normalize(col("t")))).head().getString(0)
    assert(once == twice)
  }

  test("exact dedup sees composed/decomposed duplicates only AFTER normalization") {
    val df = Seq((1L, composed + " latte"), (2L, decomposed + " latte"))
      .toDF("doc_id", "text")
    // raw bytes differ: two 'distinct' docs
    val raw = Dedup.exact(df, "text", "doc_id").collect()
    assert(raw.length == 2)
    // canonicalized: one group, lowest id kept
    val canon = df.select(col("doc_id"), nfc_normalize(col("text")).as("text"))
    val deduped = Dedup.exact(canon, "text", "doc_id").collect()
    assert(deduped.length == 1 && deduped.head.getLong(1) == 1L)
  }
}
