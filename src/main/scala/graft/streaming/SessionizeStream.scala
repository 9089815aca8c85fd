package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (SURVEY §2.10 additive capability;
  * `KeyValueGroupedDataset.flatMapGroupsWithState` per the build spec).
  *
  * Sessionization of an event stream: events for a user belong to one
  * session until `gapMs` of silence; on timeout the closed session is
  * emitted. State per key is O(1) (count + bounds), so 10^9 users on a
  * cluster is a state-store sizing problem, not an algorithmic one.
  */
object SessionizeStream {

  final case class Event(user_id: Long, ts_ms: Long, value: Double)
  final case class SessionState(start_ms: Long, last_ms: Long, n_events: Int, sum_value: Double)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
                           n_events: Int, sum_value: Double)

  def update(gapMs: Long)(userId: Long, events: Iterator[Event],
                          state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(Session(userId, s.start_ms, s.last_ms, s.n_events, s.sum_value))
    }
    var closed = List.empty[Session]
    var cur = state.getOption
    events.toSeq.sortBy(e => e.ts_ms).foreach { e =>
      cur match {
        case Some(s) if e.ts_ms - s.last_ms <= gapMs =>
          cur = Some(s.copy(last_ms = e.ts_ms, n_events = s.n_events + 1,
            sum_value = s.sum_value + e.value))
        case Some(s) =>
          closed ::= Session(userId, s.start_ms, s.last_ms, s.n_events, s.sum_value)
          cur = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
        case None =>
          cur = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
      }
    }
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutDuration(gapMs)
    }
    closed.reverseIterator
  }

  /** Wire the stateful op over a streaming Dataset[Event]. */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val se = Encoders.product[SessionState]
    implicit val oe = Encoders.product[Session]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(
        update(gapMs))
  }
}
