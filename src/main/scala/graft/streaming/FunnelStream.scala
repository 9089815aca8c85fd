package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Funnel]]: per-user ordered-step
  * progress maintained as custom state (`flatMapGroupsWithState`),
  * updated as events arrive. State per key is k timestamps (one slot
  * per step — O(1), never the event history), so funnel tracking over
  * 10^9 users is a state-store sizing problem, not an algorithmic one.
  *
  * Contract (spec-driven): with in-time-order delivery — each
  * micro-batch internally unordered is fine, batches nondecreasing in
  * time — the final per-user slots equal the batch
  * [[graft.operators.Funnel.userSlots]] fold over the full history,
  * which `funnel_conversion` gates against the DuckDB oracle. A
  * step event that arrives in a LATER batch than an already-filled
  * later step (true out-of-order across batches) cannot retro-fill —
  * the same first-touch semantics the batch fold applies within its
  * sorted pass.
  */
object FunnelStream {

  final case class StepEvent(user_id: Long, ts_ms: Long, event_type: String)
  /** -1 = slot unfilled (encoder-stable sentinel, never a valid ts). */
  final case class FunnelState(slots: Seq[Long])
  final case class UserFunnel(user_id: Long, slots: Seq[Long])

  def update(steps: Seq[String], windowMs: Option[Long])(
      userId: Long, events: Iterator[StepEvent],
      state: GroupState[FunnelState]): Iterator[UserFunnel] = {
    val k = steps.length
    val slots = state.getOption.map(_.slots.toArray)
      .getOrElse(Array.fill(k)(-1L))
    events.toSeq.sortBy(e => (e.ts_ms, e.event_type)).foreach { e =>
      val i = slots.indexWhere(_ == -1L)
      if (i >= 0 && e.event_type == steps(i) &&
        (i == 0 || e.ts_ms > slots(i - 1)) &&
        windowMs.forall(w => i == 0 || e.ts_ms <= slots(0) + w))
        slots(i) = e.ts_ms
    }
    state.update(FunnelState(slots.toSeq))
    Iterator.single(UserFunnel(userId, slots.toSeq))
  }

  /** Wire the stateful op over a streaming Dataset[StepEvent]; emits
    * the user's current slot vector each batch their state changes
    * (Update mode — downstream keeps the latest row per user).
    */
  def userFunnels(events: Dataset[StepEvent], steps: Seq[String],
                  windowMs: Option[Long] = None): Dataset[UserFunnel] = {
    implicit val se = Encoders.product[FunnelState]
    implicit val oe = Encoders.product[UserFunnel]
    events.filter(e => steps.contains(e.event_type))
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        update(steps, windowMs))
  }
}
