package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Resample

/** Resample/gap-fill semantics on a handcrafted stream: dense per-key
  * grid, zero-count gaps, forward-carried values with deterministic
  * in-bucket ties, per-key (not global) windows.
  */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ffill: dense grid, gap rows carry the prior value, ties break by tie column") {
    // user 1: events in hours 0 and 3 (gap at 1, 2); two ties in hour 0
    // user 2: single event — one-row grid
    val events = Seq(
      (10L, ts("2024-01-01 00:10:00"), 1L, 5.0),
      (11L, ts("2024-01-01 00:10:00"), 1L, 7.0), // same ts, higher id wins
      (12L, ts("2024-01-01 03:30:00"), 1L, 9.0),
      (20L, ts("2024-01-01 02:00:00"), 2L, 4.0)
    ).toDF("event_id", "ts", "user_id", "value")

    val out = Resample.ffill(events, "user_id", "ts", "value", "event_id",
        intervalSec = 3600L)
      .select("user_id", "bucket", "n_events", "value_ffill")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

    val u1 = out.filter(_._1 == 1L)
    assert(u1.map(_._2) == (u1.head._2 to u1.head._2 + 3), s"grid $u1") // dense 4-bucket span
    assert(u1.map(_._3) == Seq(2L, 0L, 0L, 1L)) // counts, gaps are 0
    assert(u1.map(_._4) == Seq(7.0, 7.0, 7.0, 9.0)) // tie -> id 11; gaps carry
    val u2 = out.filter(_._1 == 2L)
    assert(u2.map(_._3) == Seq(1L) && u2.map(_._4) == Seq(4.0))
  }

  test("ffill: bucket ids are exact integer division of epoch micros") {
    val events = Seq((1L, ts("2024-01-01 00:59:59"), 1L, 1.0),
      (2L, ts("2024-01-01 01:00:00"), 1L, 2.0)).toDF("event_id", "ts", "user_id", "value")
    val out = Resample.ffill(events, "user_id", "ts", "value", "event_id", 3600L)
      .select("bucket", "n_events").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out.length == 2 && out.map(_._2) == Seq(1L, 1L)) // boundary not merged
  }
}
