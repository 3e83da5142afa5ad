package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY.md §2.8 —
  * the reference has no streaming; this is the Spark-native stateful
  * upgrade of its timestamp-filtered sync): gap-based session assignment
  * that survives across micro-batches, per user, with the open session's
  * (id, last event time) as the only state — O(1) state per key regardless
  * of stream length. */
object StatefulSessionizer {

  final case class Ev(user_id: Long, event_id: Long, ts: Timestamp)
  final case class SessionState(sessionId: Long, lastTsMicros: Long)
  final case class Assigned(user_id: Long, event_id: Long, session_id: Long)

  val GapMicros: Long = 30L * 60 * 1000000 // 30 minutes

  def assign(userId: Long, events: Iterator[Ev],
             state: GroupState[SessionState]): Iterator[Assigned] = {
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
    val out = sorted.map { e =>
      val ts = e.ts.getTime * 1000
      val gap = st.lastTsMicros != Long.MinValue && ts - st.lastTsMicros <= GapMicros
      // lastTs only ever advances: a late cross-batch event (above watermark
      // but older than the session's frontier) joins the open session WITHOUT
      // rewinding it — a rewound baseline would misread the next in-gap
      // event as a session break and set the eviction timeout in the past
      st = if (gap) st.copy(lastTsMicros = math.max(ts, st.lastTsMicros))
           else SessionState(st.sessionId + 1, ts)
      Assigned(userId, e.event_id, st.sessionId)
    }
    state.update(st)
    out.iterator
  }

  /** Streaming session assignment; works on a batch Dataset too via the
    * streaming-batch unification of flatMapGroupsWithState. */
  def sessionize(events: Dataset[Ev]): Dataset[Assigned] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Assigned]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(assign)
  }

  /** Like [[assign]] but with event-time state eviction: once the watermark
    * passes a key's session gap, its state is dropped — state size stays
    * bounded by the number of *active* keys, the requirement for unbounded
    * key spaces at stream scale. A key seen again after eviction starts a
    * fresh session numbering (by design: evicted state is gone). */
  def assignWithEviction(userId: Long, events: Iterator[Ev],
                         state: GroupState[SessionState]): Iterator[Assigned] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val out = assign(userId, events, state)
      // evict after one gap of event-time inactivity
      state.setTimeoutTimestamp(state.get.lastTsMicros / 1000 + GapMicros / 1000)
      out
    }
  }

  /** Streaming variant with eviction; `events` must carry a watermark on
    * `ts` (event-time timeouts are driven by it). */
  def sessionizeWithEviction(events: Dataset[Ev]): Dataset[Assigned] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Assigned]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(assignWithEviction)
  }
}
