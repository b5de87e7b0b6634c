package graft

import org.apache.spark.sql.functions._

import graft.queries.ReferenceQueries
import graft.streaming.StatefulSessionize
import graft.streaming.StatefulSessionize.Ev

/** The stateful (flatMapGroupsWithState) sessionizer must agree with the
  * declarative window-lag formulation that the DuckDB oracle checks.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("stateful sessionize agrees with the window-lag formulation") {
    val sf = "/root/testdata/sf0.001"
    val evs = Tables.load(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[Ev]
    val stateful = StatefulSessionize.sessions(evs, gapMinutes = 30)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .orderBy("user_id")
      .as[(Long, Long, Long)].collect().toSeq

    val declarative = ReferenceQueries.eventsSessionize(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq

    assert(stateful == declarative)
  }

  test("session boundaries: exact gap handling") {
    val gapUs = 30L * 60 * 1000000
    val evs = Seq(
      Ev(1, 0), Ev(1, gapUs),          // exactly at gap -> same session
      Ev(1, 2 * gapUs + 1),            // 1us past gap -> new session
      Ev(2, 5)).toDS()
    val r = StatefulSessionize.sessions(evs, 30).collect()
      .groupBy(_.user_id).view.mapValues(_.length).toMap
    assert(r == Map(1L -> 2, 2L -> 1))
  }
}
