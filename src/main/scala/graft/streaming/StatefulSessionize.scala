package graft.streaming

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Stateful sessionization with explicit per-user state — the
  * `KeyValueGroupedDataset.flatMapGroupsWithState` surface, usable over a
  * stream (event-time timeout closes sessions when the watermark passes)
  * and over a batch Dataset (state lives for the run; all sessions close
  * at end-of-group).
  *
  * Batch semantics match ReferenceQueries.eventsSessionize (a session
  * break is a gap > `gapMinutes`), which is the oracle-checked formulation
  * — SessionizeSpec asserts the two agree.
  */
object StatefulSessionize {

  final case class Ev(user_id: Long, ts_us: Long)
  final case class EvT(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionSummary(user_id: Long, session_id: Long,
                                  n_events: Long, start_us: Long, end_us: Long)
  final case class UserState(sessionId: Long, count: Long, startUs: Long, lastUs: Long)

  /** Fold a (sorted) slice of one user's events into the running state,
    * emitting every gap-closed session. Shared by the batch and streaming
    * paths so their session semantics cannot drift.
    */
  private def foldEvents(userId: Long, sorted: Seq[Ev], st0: UserState, gapUs: Long)
      : (Seq[SessionSummary], UserState) = {
    val out = scala.collection.mutable.ArrayBuffer[SessionSummary]()
    var st = st0
    sorted.foreach { e =>
      if (st.count > 0L && e.ts_us - st.lastUs <= gapUs) {
        st = st.copy(count = st.count + 1, lastUs = e.ts_us)
      } else {
        if (st.count > 0L)
          out += SessionSummary(userId, st.sessionId, st.count, st.startUs, st.lastUs)
        st = UserState(st.sessionId + 1, 1L, e.ts_us, e.ts_us)
      }
    }
    (out.toSeq, st)
  }

  /** `emitOpen = true` (batch): the trailing still-open session is emitted
    * too — correct when the whole group arrives in one invocation.
    * `emitOpen = false`: only gap-closed sessions are emitted; the open
    * session stays in state and continues across invocations (over a real
    * stream use [[sessionsStream]], whose event-time timeout flushes it
    * when the watermark passes the gap).
    */
  def sessions(events: Dataset[Ev], gapMinutes: Int,
               emitOpen: Boolean = true): Dataset[SessionSummary] = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    implicit val evEnc = Encoders.product[Ev]
    implicit val outEnc = Encoders.product[SessionSummary]
    implicit val longEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[UserState]) =>
          // order the delivered batch by event time, split on gaps, emit
          // every gap-closed session; the open session persists in state
          val st0 = state.getOption.getOrElse(UserState(0L, 0L, -1L, Long.MinValue))
          val (closed, stFold) = foldEvents(userId, evs.toSeq.sortBy(_.ts_us), st0, gapUs)
          val out = scala.collection.mutable.ArrayBuffer[SessionSummary](closed: _*)
          var st = stFold
          if (emitOpen && st.count > 0L) {
            out += SessionSummary(userId, st.sessionId, st.count, st.startUs, st.lastUs)
            st = st.copy(count = 0L) // emitted; keep the id counter only
          }
          state.update(st)
          out.iterator
      }(Encoders.product[UserState], outEnc)
  }

  /** Streaming sessionization over a watermarked (user_id, ts) stream:
    * gap-closed sessions emit as their closing event arrives, and the
    * trailing OPEN session emits through an EVENT-TIME TIMEOUT when the
    * watermark passes its last event + gap — no session is ever stuck in
    * state (the r1 gap). After the flush only the id counter survives, so
    * state per user is a constant-size record and session ids never
    * repeat.
    *
    * `events` needs `user_id` (castable to long) and a timestamp column
    * `ts`; `watermarkDelay` is the usual lateness allowance.
    */
  def sessionsStream(events: DataFrame, gapMinutes: Int,
                     watermarkDelay: String = "10 minutes"): Dataset[SessionSummary] = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    implicit val evtEnc = Encoders.product[EvT]
    implicit val outEnc = Encoders.product[SessionSummary]
    implicit val longEnc = Encoders.scalaLong

    events
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[EvT], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastUs + gap: the open session can never
            // gain another event — close and emit it
            val st = state.get
            state.update(st.copy(count = 0L))
            if (st.count > 0L)
              Iterator.single(
                SessionSummary(userId, st.sessionId, st.count, st.startUs, st.lastUs))
            else Iterator.empty
          } else {
            val sorted = evs.toSeq
              .map { e =>
                // full microsecond precision — epochMilli would truncate
                // and drift from the batch path on µs-resolution events
                val inst = e.ts.toInstant
                Ev(e.user_id, inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
              }
              .sortBy(_.ts_us)
            val st0 = state.getOption.getOrElse(UserState(0L, 0L, -1L, Long.MinValue))
            val (closed, st) = foldEvents(userId, sorted, st0, gapUs)
            state.update(st)
            if (st.count > 0L)
              state.setTimeoutTimestamp((st.lastUs + gapUs) / 1000L) // µs -> ms
            closed.iterator
          }
      }(Encoders.product[UserState], outEnc)
  }
}
