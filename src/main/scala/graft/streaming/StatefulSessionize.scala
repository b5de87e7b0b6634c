package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, Encoders}

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
  final case class SessionSummary(user_id: Long, session_id: Long,
                                  n_events: Long, start_us: Long, end_us: Long)
  final case class UserState(sessionId: Long, count: Long, startUs: Long, lastUs: Long)

  /** `emitOpen = true` (batch): the trailing still-open session is emitted
    * too — correct when the whole group arrives in one invocation.
    * `emitOpen = false` (streaming): only gap-closed sessions are emitted;
    * the open session stays in state and continues across micro-batches
    * (final flush on stream end is a round-2 event-time-timeout follow-up).
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
          val sorted = evs.toSeq.sortBy(_.ts_us)
          val out = scala.collection.mutable.ArrayBuffer[SessionSummary]()
          var st = state.getOption.getOrElse(UserState(0L, 0L, -1L, Long.MinValue))
          sorted.foreach { e =>
            if (st.count > 0L && e.ts_us - st.lastUs <= gapUs) {
              st = st.copy(count = st.count + 1, lastUs = e.ts_us)
            } else {
              if (st.count > 0L)
                out += SessionSummary(userId, st.sessionId, st.count, st.startUs, st.lastUs)
              st = UserState(st.sessionId + 1, 1L, e.ts_us, e.ts_us)
            }
          }
          if (emitOpen && st.count > 0L) {
            out += SessionSummary(userId, st.sessionId, st.count, st.startUs, st.lastUs)
            st = st.copy(count = 0L) // emitted; keep the id counter only
          }
          state.update(st)
          out.iterator
      }(Encoders.product[UserState], outEnc)
  }
}
