package graft

import java.sql.Timestamp

import graft.operators.Funnel

/** Pins Funnel.funnelTimes' ordering contract on a constructed stream:
  * strict-after step advancement, null cascade on drop-out, earliest-
  * occurrence selection, and partition invariance.
  */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  private val events = Seq(
    // user 1: full funnel, with decoys (later duplicate steps ignored)
    (1L, "signup", ts(1000)), (1L, "click", ts(2000)),
    (1L, "click", ts(3000)), (1L, "purchase", ts(4000)),
    // user 2: click BEFORE signup must not count; no click after → stalls
    (2L, "click", ts(500)), (2L, "signup", ts(1000)), (2L, "purchase", ts(2000)),
    // user 3: same-microsecond click does NOT advance (strict >)
    (3L, "signup", ts(1000)), (3L, "click", ts(1000)),
    // user 4: never signs up
    (4L, "click", ts(100)), (4L, "purchase", ts(200))
  ).toDF("user_id", "event_type", "ts")

  private def run(df: org.apache.spark.sql.DataFrame) =
    Funnel.funnelTimes(df, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)), Option(r.getTimestamp(3))))
      .toMap

  test("strict-after ordering, null cascade, earliest occurrence") {
    val f = run(events)
    assert(f(1L) == ((Some(ts(1000)), Some(ts(2000)), Some(ts(4000)))))
    // user 2: pre-signup click ignored; purchase can't count without click
    assert(f(2L) == ((Some(ts(1000)), None, None)))
    // user 3: equal timestamp does not advance the funnel
    assert(f(3L) == ((Some(ts(1000)), None, None)))
    // user 4: no signup → all null
    assert(f(4L) == ((None, None, None)))
  }

  test("partition invariant") {
    assert(run(events).toSeq.sortBy(_._1) ==
      run(events.repartition(7)).toSeq.sortBy(_._1))
  }

  test("cohort retention: anchor gating, offsets, and rates") {
    // weeks: 2024-01-01 (Mon) and 2024-01-08
    val w0 = 1704067200000L // 2024-01-01T00:00Z
    val day = 86400000L
    val ev = Seq(
      (1L, "signup", ts(w0 + day)), (1L, "click", ts(w0 + 8 * day)),   // w0 cohort, active w0+w1
      (2L, "signup", ts(w0 + 2 * day)),                                // w0 cohort, w0 only
      (3L, "click", ts(w0 + day)),                                     // never signs up → no cohort
      (4L, "signup", ts(w0 + 9 * day))                                 // w1 cohort
    ).toDF("user_id", "event_type", "ts")
    val r = Funnel.cohortRetention(ev, "user_id", "event_type", "ts", "signup")
      .collect()
      .map(x => (x.getString(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3), x.getDouble(4)))
      .toMap
    assert(r(("2024-01-01", 0L)) == ((2L, 2L, 1.0)))  // both w0 users active in w0
    assert(r(("2024-01-01", 1L)) == ((1L, 2L, 0.5)))  // only user 1 returns
    assert(r(("2024-01-08", 0L)) == ((1L, 1L, 1.0)))
    assert(r.size == 3) // user 3's activity creates no cohort cell
  }

  test("dwell: exact per-pair medians, drop-outs contribute nothing") {
    // user 1: signup→click 1000µs, click→purchase 2000µs (dwell from the
    //         FIRST qualifying click at 2000, not the decoy at 3000)
    // user 2: stalls after signup → no dwell rows at all
    // user 5: signup→click 3000µs, no purchase → only the first pair
    val ev = events.union(Seq(
      (5L, "signup", ts(10000)), (5L, "click", ts(13000))
    ).toDF("user_id", "event_type", "ts"))
    val d = Funnel.funnelDwell(ev, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // pair 1 dwells: {1000, 3000} ms = {1e6, 3e6} µs → interpolated
    // p50 = 2e6, p90 = 2.8e6; n = 2
    assert(d(1) == (("signup->click", 2L, 2000000.0, 2800000.0)))
    // pair 2 dwells: {2000 ms} → both percentiles the single value
    assert(d(2) == (("click->purchase", 1L, 2000000.0, 2000000.0)))
  }

  test("dwell: GK sketch path inside the exact anchor's rank envelope at sf0.01") {
    // GK guarantees RANK error (returned value's rank within ±ε·n of the
    // target), not value error — on a heavy-tailed dwell distribution the
    // neighbor gap can dwarf any value tolerance. Assert the sketch's
    // p50/p90 land between the exact p45–p55 / p85–p95 per step pair.
    val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
    val steps = Seq("signup", "click", "purchase")
    val a = Funnel.funnelDwell(ev, "user_id", "event_type", "ts", steps,
        exact = false)
      .collect().map(r => r.getInt(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    val env = Funnel.funnelTimes(ev, "user_id", "event_type", "ts", steps)
      .select(org.apache.spark.sql.functions.expr(
        "percentile(unix_micros(t2) - unix_micros(t1), array(0.45, 0.55, 0.85, 0.95))")
        .as("q"))
      .head().getSeq[Double](0)
    assert(a.nonEmpty)
    val (a50, a90) = a(1)
    assert(a50 >= env(0) && a50 <= env(1), s"p50 $a50 outside [${env(0)}, ${env(1)}]")
    assert(a90 >= env(2) && a90 <= env(3), s"p90 $a90 outside [${env(2)}, ${env(3)}]")
  }

  test("plan: step-type filter pushed to the events scan") {
    // ev_funnel reads the real parquet fixture — the isin(steps) filter
    // must reach the scan as a pushed In predicate, so a 100 TB events
    // table with hundreds of types only surfaces the 3 funnel types.
    val p = SparkEntry.queries("ev_funnel")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("In(event_type, [click,purchase,signup])"), p.take(1500))
  }

  test("plan: one exchange by entity, no joins") {
    val p = Funnel.funnelTimes(events, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(800))
    assert(p.sliding("Exchange".length).count(_ == "Exchange") <= 2, p.take(1200))
  }
}
