package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Dedup

/** The portable-hash contracts feed DuckDB oracles, so the native codegen
  * implementations must stay bit-equal to the documented column formulas
  * (md5 hex → conv → polynomial fold). These specs pin that equivalence
  * on adversarial text so the fast path can never silently drift from the
  * spec the oracles implement.
  */
class PortableHashParitySpec extends SparkSpec {
  import spark.implicits._

  private def draws[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(77L + i)))

  // texts with empty tokens, repeated spaces, unicode, shorts and longs
  private val textGen: Gen[String] = Gen.oneOf(
    Gen.listOfN(12, Gen.oneOf("alpha", "beta", "Gamma", "DÉLTA", "e", "", "ñu"))
      .map(_.mkString(" ")),
    Gen.alphaStr,
    Gen.const(""),
    Gen.const("  leading and trailing  "),
    Gen.const("a  b   c"), // repeated spaces -> empty tokens
    Gen.listOfN(40, Gen.alphaLowerStr).map(_.mkString(" ")))

  test("PortableShingles == documented md5-poly column formula") {
    val texts = draws(textGen, 60).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val native = df.select(col("id"),
        array_sort(graft.functions.portable_shingles(col("text"), 5)).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    // the reference formula, in plain column functions
    val toks = split(lower(trim(col("text"))), " ")
    val th = transform(toks, w => conv(substring(md5(w), 1, 6), 16, 10).cast("long"))
    val poly = (arr: org.apache.spark.sql.Column) =>
      aggregate(arr, lit(0L), (acc, x) => (acc * 31 + x) % 1000000007L)
    val formula = df.select(col("id"), array_sort(array_distinct(
        when(size(toks) < 5, array(poly(th))).otherwise(
          transform(sequence(lit(0), size(toks) - 5),
            i => poly(slice(th, i + 1, lit(5))))))).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == formula)
  }

  test("portable SimHash64 == per-bit md5 vote formula") {
    val texts = draws(textGen, 40).distinct.filter(_.nonEmpty)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val native = df.select(col("id"),
        graft.functions.simhash64(graft.operators.TextAnalysis.tokens(col("text")),
          portable = true).as("sig"))
      .as[(Long, Long)].collect().toMap
    // reimplement the documented contract from the md5 HEX STRING: bit m
    // (MSB-first) of a token = bit (3 - m%4) of hex digit m/4; signature
    // bit j = vote sign of token bits at m = 63 - j
    def hexBits(tok: String): Array[Int] = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
      Array.tabulate(64) { m =>
        (Integer.parseInt(hex(m / 4).toString, 16) >> (3 - m % 4)) & 1
      }
    }
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.trim.toLowerCase.split(" ", -1)
      val votes = new Array[Int](64)
      toks.foreach { tok =>
        val bits = hexBits(tok)
        for (m <- 0 until 64) votes(63 - m) += (if (bits(m) == 1) 1 else -1)
      }
      var sig = 0L
      for (j <- 0 until 64) if (votes(j) >= 0) sig |= 1L << j
      assert(native(i.toLong) == sig, s"text '$t'")
    }
  }

  test("corpus sampling selects identical ids in batch and streaming") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ids = (0L until 300L)
    val batch = graft.operators.CorpusOps.sampleByHash(
        ids.toDF("doc_id"), "doc_id", 0.3, "st")
      .as[Long].collect().toSet
    val input = MemoryStream[Long]
    val q = graft.operators.CorpusOps.sampleByHash(
        input.toDF().toDF("doc_id"), "doc_id", 0.3, "st")
      .writeStream.outputMode("append").format("memory").queryName("samp_out").start()
    input.addData(ids: _*)
    q.processAllAvailable()
    val streamed = spark.table("samp_out").as[Long].collect().toSet
    q.stop()
    assert(streamed == batch) // map-only filters are stream-transparent
  }
}
