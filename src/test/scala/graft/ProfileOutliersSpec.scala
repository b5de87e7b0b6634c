package graft

import graft.operators.{Outliers, Profile}

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

  test("madOutliers: MAD=0 group is degenerate and emits nothing") {
    val df = (Seq.fill(8)(5.0) :+ 100.0).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }.toDF("key", "id", "v")
    // median=5, over half the values sit on it -> MAD=0 -> no rows
    assert(Outliers.madOutliers(df, "key", "id", "v").count() == 0)
  }
}
