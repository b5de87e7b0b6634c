package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

/** As-of join semantics on hand-built fixtures; the corpus-level check is
  * the ev_asof_join oracle vs DuckDB's native ASOF LEFT JOIN.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("latest at-or-before right row per key; equal ts matches; no match -> nulls") {
    val left = Seq(
      (1L, "u1", ts(100)),
      (2L, "u1", ts(205)), // after both u1 quotes -> latest (200) wins
      (3L, "u1", ts(200)), // equal ts -> the 200 quote itself matches
      (4L, "u2", ts(50)),  // before u2's only quote -> null
      (5L, "u3", ts(90))   // key absent on right -> null
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts(100), 1.0),
      ("u1", ts(200), 2.0),
      ("u2", ts(60), 9.0)
    ).toDF("k", "t", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
      .select($"id", $"asof_v").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(2.0),
      4L -> None, 5L -> None))
  }

  test("legitimately-null right values survive (struct payload, not per-column last)") {
    val left = Seq((1L, "u", ts(300))).toDF("id", "k", "t")
    val right = Seq(
      ("u", ts(100), Some(7.0)),
      ("u", ts(200), Option.empty[Double]) // latest row HAS a null value
    ).toDF("k", "t", "v")
    val r = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
      .select($"asof_t", $"asof_v").collect().head
    assert(r.getTimestamp(0) == ts(200)) // matched the latest row...
    assert(r.isNullAt(1))                // ...and kept its null value
  }

  test("join-equality null semantics: null-ts/key right rows never match; null-key left rows get nulls") {
    val left = Seq(
      (1L, Some("u"), Some(ts(300))),
      (2L, None: Option[String], Some(ts(300))), // null key -> no match
      (3L, Some("u"), None: Option[java.sql.Timestamp]) // null ts -> no match
    ).toDF("id", "k", "t")
    val right = Seq(
      (Some("u"), None: Option[java.sql.Timestamp], 9.0), // null ts: unmatchable
      (None: Option[String], Some(ts(100)), 8.0),         // null key: unmatchable
      (Some("u"), Some(ts(100)), 1.0)
    ).toDF("k", "t", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
      .select($"id", $"asof_v").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(1.0), 2L -> None, 3L -> None))
  }

  test("tieBreak accepts right-frame columns outside valueCols") {
    val left = Seq((1L, "u", ts(500))).toDF("id", "k", "t")
    val right = Seq(("u", ts(400), 1.0, 10L), ("u", ts(400), 2.0, 5L))
      .toDF("k", "t", "v", "seq")
    val r = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"),
        tieBreak = Seq("seq"))
      .select($"asof_v").as[Double].collect()
    assert(r.toSeq == Seq(1.0)) // last under ascending seq (10 > 5)
  }

  test("tieBreak orders equal-timestamp right rows deterministically") {
    val left = Seq((1L, "u", ts(500))).toDF("id", "k", "t")
    val right = Seq(("u", ts(400), 1.0), ("u", ts(400), 2.0)).toDF("k", "t", "v")
    val r = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"),
        tieBreak = Seq("v"))
      .select($"asof_v").as[Double].collect()
    assert(r.toSeq == Seq(2.0)) // last under ascending v
  }
}
