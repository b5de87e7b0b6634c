package graft

import org.apache.spark.sql.functions.col

import graft.operators.{Outliers, Privacy, Profile}

/** Column profiler (null/distinct/min/max semantics on hand-built data)
  * and robust MAD outliers (hand-computed z-scores, MAD=0 degeneracy).
  */
class ProfileOutliersSpec extends SparkSpec {
  import spark.implicits._

  test("profile: null, distinct, and string min/max semantics") {
    val df = Seq(
      (Some(1L), Some("b")), (Some(2L), None),
      (Some(10L), Some("a")), (None, Some("a"))
    ).toDF("k", "s")
    val rows = Profile.profile(df, Seq("k", "s"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    // string min/max: "1" < "10" < "2" lexicographically — the documented
    // rendered-string contract, not numeric order
    assert(rows == Seq(
      ("k", 4L, 1L, 3L, "1", "2"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  test("profile: hostile column names (dots, spaces, quotes, backticks) are data, not SQL") {
    val df = Seq((1L, "x"), (2L, "y"), (2L, null))
      .toDF("a.b c", "weird`'\", name")
    val out = Profile.profile(df, Seq("a.b c", "weird`'\", name"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(out("a.b c") == ((3L, 0L, 2L, "1", "2")))
    assert(out("weird`'\", name") == ((3L, 1L, 2L, "x", "y")))
    val e = intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("nope) FROM x; --"))
    }
    assert(e.getMessage.contains("no such column"))
  }

  test("profile: approx-distinct path tracks the exact anchor within 2% at sf0.01") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    def byCol(exact: Boolean) = Profile.profile(docs, cols, exact = exact)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    val e = byCol(exact = true)
    val a = byCol(exact = false)
    cols.foreach { c =>
      // counts, nulls, min/max are exact on both paths
      assert(a(c)._1 == e(c)._1 && a(c)._2 == e(c)._2)
      assert(a(c)._4 == e(c)._4 && a(c)._5 == e(c)._5)
      // HLL++ at rsd 0.01: distinct within 2% of the exact anchor
      val (ed, ad) = (e(c)._3.toDouble, a(c)._3.toDouble)
      assert(math.abs(ad - ed) <= math.max(1.0, 0.02 * ed),
        s"$c: approx $ad vs exact $ed")
    }
  }

  test("profile sketches: per-drop persist + merge ≡ whole-corpus profile (sketch tolerance)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val cols = Seq("doc_id", "text", "lang", "source")
    val drop1 = docs.filter(col("doc_id") % 3 === 0)
    val drop2 = docs.filter(col("doc_id") % 3 =!= 0)
    // the production lifecycle: one sketch table persisted per drop,
    // merged at read — the binary HLL column must round-trip parquet
    val store = tempDir("profsketch")
    Profile.sketch(drop1, cols).write.parquet(s"$store/drop=1")
    Profile.sketch(drop2, cols).write.parquet(s"$store/drop=2")
    val merged = Profile.mergeSketches(spark.read.parquet(s"$store/drop=1")
        .unionByName(spark.read.parquet(s"$store/drop=2")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    val whole = Profile.profile(docs, cols)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    cols.foreach { c =>
      // counts, nulls, min, max merge EXACTLY
      assert(merged(c)._1 == whole(c)._1 && merged(c)._2 == whole(c)._2, c)
      assert(merged(c)._4 == whole(c)._4 && merged(c)._5 == whole(c)._5, c)
      // distinct: HLL union estimate within 2% of the exact anchor
      val (ed, md) = (whole(c)._3.toDouble, merged(c)._3.toDouble)
      assert(math.abs(md - ed) <= math.max(1.0, 0.02 * ed), s"$c: merged $md vs exact $ed")
    }
    // merging a single drop's sketch == sketching that drop alone
    val solo = Profile.mergeSketches(spark.read.parquet(s"$store/drop=1"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(solo("doc_id") == drop1.count())
  }

  test("profile sketches: an all-null column in one drop merges cleanly (null HLL skipped)") {
    import spark.implicits._
    val d1 = Seq((1L, Option.empty[String]), (2L, None)).toDF("k", "s")
    val d2 = Seq((3L, Some("x")), (4L, Some("y"))).toDF("k", "s")
    val merged = Profile.mergeSketches(
        Profile.sketch(d1, Seq("k", "s")).unionByName(Profile.sketch(d2, Seq("k", "s"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    // drop 1 contributed a NULL sketch for s (no non-null values) — the
    // union must skip it, not fail; counts and nulls still merge exactly
    assert(merged("s") == ((4L, 2L, 2L, "x", "y")))
    assert(merged("k")._3 == 4L)
  }

  test("madOutliers: hand-computed modified z, only outliers emitted") {
    // group g: values 1..9 plus a 1000 spike. median=5.5, MAD=2.5
    // z(1000) = 0.6745*(1000-5.5)/2.5 = 268.30989
    val df = ((1 to 9).map(v => ("g", v.toLong, v.toDouble)) :+ ("g", 10L, 1000.0))
      .toDF("key", "id", "v")
    val out = Outliers.madOutliers(df, "key", "id", "v", threshold = 3.5)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(out.size == 1)
    val (_, id, v, z) = out.head
    assert(id == 10L && v == 1000.0)
    assert(math.abs(z - 0.6745 * (1000.0 - 5.5) / 2.5) < 1e-9)
  }

  test("madOutliers: sketch path tracks the exact anchor at sf0.01") {
    val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
    def flagged(exact: Boolean) = Outliers.madOutliers(ev, "event_type",
        "event_id", "value", threshold = 3.5, exact = exact)
      .select("event_type", "event_id")
      .as[(String, Long)].collect().toSet
    val e = flagged(true)
    val a = flagged(false)
    assert(e.nonEmpty && a.nonEmpty)
    // GK medians land on actual values instead of interpolations, so a
    // few boundary rows may flip — the sets must agree to 2%
    val diff = (e.diff(a) ++ a.diff(e)).size
    assert(diff <= math.max(1, (0.02 * e.size).toInt), s"sym-diff $diff of ${e.size}")
  }

  test("kAnonViolations: strict boundary, empty report iff k-anonymous") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(2)("b") ++ Seq.fill(4)("c"))
      .zipWithIndex.map { case (g, i) => (g, i.toLong) }.toDF("qid", "id")
    val v = graft.operators.Privacy.kAnonViolations(df, Seq("qid"), k = 5)
      .orderBy("qid").as[(String, Long)].collect().toSeq
    // a has exactly k=5 members -> compliant (strict <); b and c violate
    assert(v == Seq(("b", 2L), ("c", 4L)))
    assert(graft.operators.Privacy.kAnonViolations(df, Seq("qid"), k = 2)
      .count() == 0) // every group >= 2 -> 2-anonymous
  }

  test("lDiversityViolations: homogeneous groups flagged, diverse ones pass") {
    // group a: 4 rows but only 1 sensitive value (homogeneity attack);
    // group b: 2 rows, 2 values -> 2-diverse
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("a", "x"),
      ("b", "x"), ("b", "y")).toDF("qid", "s")
    val v = graft.operators.Privacy.lDiversityViolations(df, Seq("qid"), "s", l = 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(v == Seq(("a", 4L, 1L)))
  }

  test("tClosenessViolations: skewed group flagged with hand-computed TVD, balanced groups pass") {
    // neutral group n: 10× each of x/y/z (dominates the global mix);
    // group a mirrors the global mix (tiny TVD); group b is ALL x —
    // 3 distinct-diverse? no (1 value), but the point is the skew:
    // global q = (14/36, 11/36, 11/36), so
    // TVD(b) = 0.5·((1 − 14/36) + 11/36 + 11/36) = 22/36 = 0.611111
    val rows =
      (1 to 10).flatMap(_ => Seq(("n", "x"), ("n", "y"), ("n", "z"))) ++
        Seq(("a", "x"), ("a", "y"), ("a", "z")) ++
        Seq(("b", "x"), ("b", "x"), ("b", "x"))
    val df = rows.toDF("grp", "diag")
    val out = Privacy.tClosenessViolations(df, Seq("grp"), "diag", t = 0.3)
      .as[(String, Long, Double)].collect().toSet
    assert(out == Set(("b", 3L, 0.611111)), out.toString)
    // partition-invariance of the fixed-point TVD
    val out32 = Privacy.tClosenessViolations(df.repartition(32), Seq("grp"),
        "diag", t = 0.3)
      .as[(String, Long, Double)].collect().toSet
    assert(out32 == out)
    // t above every group's distance: empty report = compliant
    assert(Privacy.tClosenessViolations(df, Seq("grp"), "diag", t = 0.7).isEmpty)
  }

  test("tClosenessViolations: null sensitive rows are excluded, not silently denormalizing") {
    // group b is all-x among NON-NULL rows; the nulls would otherwise
    // inflate nTotal so q stops summing to 1 and every TVD skews
    val rows =
      (1 to 10).flatMap(_ => Seq(("n", Some("x")), ("n", Some("y")), ("n", Some("z")))) ++
        Seq(("a", Some("x")), ("a", Some("y")), ("a", Some("z"))) ++
        Seq(("b", Some("x")), ("b", Some("x")), ("b", Some("x")),
          ("b", None), ("n", None))
    val withNulls = rows.toDF("grp", "diag")
    val noNulls = rows.filter(_._2.isDefined).toDF("grp", "diag")
    def audit(df: org.apache.spark.sql.DataFrame) =
      Privacy.tClosenessViolations(df, Seq("grp"), "diag", t = 0.3)
        .as[(String, Long, Double)].collect().toSet
    assert(audit(withNulls) == audit(noNulls))
    assert(audit(withNulls) == Set(("b", 3L, 0.611111)))
  }

  test("tClosenessViolations: one corpus scan — result plan reads only the checkpointed aggregate") {
    // the corpus is read exactly once, in gv's eager-checkpoint job; the
    // returned plan must contain NO file scan (q, nTotal, and the TVD
    // tail are all rollups of the materialized contingency table)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = Privacy.tClosenessViolations(docs, Seq("source"), "lang", t = 0.15)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"), plan.take(800))
    assert(out.count() >= 0)
  }

  test("madOutliers: MAD=0 group is degenerate and emits nothing") {
    val df = (Seq.fill(8)(5.0) :+ 100.0).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }.toDF("key", "id", "v")
    // median=5, over half the values sit on it -> MAD=0 -> no rows
    assert(Outliers.madOutliers(df, "key", "id", "v").count() == 0)
  }
}
