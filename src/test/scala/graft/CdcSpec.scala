package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Pins Cdc.tableDiff's classification contract on constructed frames:
  * added/removed/changed detection, null-vs-empty discrimination, the
  * silent-on-unchanged rule, and partition invariance.
  */
class CdcSpec extends SparkSpec {

  import spark.implicits._

  private def frame(rows: Seq[(Long, Option[String], String)]) =
    rows.toDF("id", "v1", "v2")

  test("classifies added, removed, changed; silent on unchanged") {
    val oldDf = frame(Seq(
      (1L, Some("a"), "x"), // unchanged
      (2L, Some("b"), "y"), // changed (v2)
      (3L, Some("c"), "z")  // removed
    ))
    val newDf = frame(Seq(
      (1L, Some("a"), "x"),
      (2L, Some("b"), "Y"),
      (4L, Some("d"), "w")  // added
    ))
    val diff = Cdc.tableDiff(oldDf, newDf, Seq("id"), Seq("v1", "v2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("null and empty string hash differently") {
    val oldDf = frame(Seq((1L, None, "x")))
    val newDf = frame(Seq((1L, Some(""), "x")))
    val diff = Cdc.tableDiff(oldDf, newDf, Seq("id"), Seq("v1", "v2")).collect()
    assert(diff.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "changed")))
  }

  test("null keys join null-safely: unchanged content emits nothing") {
    val oldDf = Seq((Option.empty[java.lang.Long], Option("a"), "x"),
      (Option(java.lang.Long.valueOf(1L)), Option("b"), "y"))
      .toDF("id", "v1", "v2")
    val newDf = Seq((Option.empty[java.lang.Long], Option("a"), "x"),
      (Option(java.lang.Long.valueOf(1L)), Option("b"), "y"))
      .toDF("id", "v1", "v2")
    assert(Cdc.tableDiff(oldDf, newDf, Seq("id"), Seq("v1", "v2")).count() == 0)
    // and a changed null-keyed row reports exactly one 'changed'
    val newDf2 = Seq((Option.empty[java.lang.Long], Option("a"), "X"),
      (Option(java.lang.Long.valueOf(1L)), Option("b"), "y"))
      .toDF("id", "v1", "v2")
    val d = Cdc.tableDiff(oldDf, newDf2, Seq("id"), Seq("v1", "v2")).collect()
    assert(d.length == 1 && d(0).isNullAt(0) && d(0).getString(1) == "changed")
  }

  test("strict mode fails fast on duplicate keys; off by default") {
    val oldDf = frame(Seq((1L, Some("a"), "x"), (1L, Some("b"), "y")))
    val newDf = frame(Seq((1L, Some("a"), "x")))
    // default: standard CDC contract, duplicates are the caller's problem
    Cdc.tableDiff(oldDf, newDf, Seq("id"), Seq("v1", "v2")).collect()
    val e = intercept[IllegalArgumentException] {
      Cdc.tableDiff(oldDf, newDf, Seq("id"), Seq("v1", "v2"), strict = true)
    }
    assert(e.getMessage.contains("old snapshot has 1 duplicate"), e.getMessage)
    // clean snapshots pass strict unchanged
    val clean = Cdc.tableDiff(newDf, newDf, Seq("id"), Seq("v1", "v2"), strict = true)
    assert(clean.count() == 0)
    // null keys count as keys in the uniqueness check too
    val dupNull = Seq((Option.empty[java.lang.Long], "x"),
      (Option.empty[java.lang.Long], "y")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Cdc.tableDiff(dupNull, dupNull.limit(1), Seq("id"), Seq("v"), strict = true)
    }
  }

  test("column boundaries are not confusable") {
    // ("ab", "c") vs ("a", "bc") — same concatenation without a separator
    val oldDf = frame(Seq((1L, Some("ab"), "c")))
    val newDf = frame(Seq((1L, Some("a"), "bc")))
    assert(Cdc.tableDiff(oldDf, newDf, Seq("id"), Seq("v1", "v2")).count() == 1)
  }

  test("fixture diff is partition-invariant and matches direct recompute") {
    val sf = "/root/testdata/sf0.01"
    def run(parts: Int) = {
      val d = Tables.load(spark, sf, "documents")
      val base = if (parts > 0) d.repartition(parts) else d
      val oldSnap = base.filter(col("doc_id") % 7 =!= 0)
      val newSnap = base.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      Cdc.tableDiff(oldSnap, newSnap, Seq("doc_id"), Seq("text", "lang", "source"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    }
    val a = run(0)
    assert(a.nonEmpty && a == run(17))
    // spot semantics: a doc_id divisible by 35 exists only in neither
    // snapshot; divisible by 7 (not 5/3) only in new → added
    a.foreach { case (id, ch) =>
      if (id % 7 == 0) assert(ch == "added", s"$id: $ch")
      else if (id % 5 == 0) assert(ch == "removed", s"$id: $ch")
      else if (id % 3 == 0) assert(ch == "changed", s"$id: $ch")
    }
  }
}
