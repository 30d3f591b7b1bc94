package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time input for the streaming sequence matcher. */
case class FunnelEv(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
    event_type: String)

/** One SETTLED instance: the anchor time, the bound step times (as
  * many as completed), and the q102 `steps_done` count (anchor = 1).
  * An instance settles COMPLETE (all steps bound) or FAILED (first
  * qualifying event past the gap, or the watermark passed the gap
  * deadline with no qualifying event). */
case class FunnelMatch(user_id: Long, t0_us: Long, bound_us: Seq[Long],
    steps_done: Int)

private[streaming] case class FunnelBuf(tsUs: Long, eventId: Long,
    eventType: String)
private[streaming] case class FunnelOpen(t0Us: Long, boundUs: Seq[Long])
private[streaming] case class FunnelState(buffer: Seq[FunnelBuf],
    open: Seq[FunnelOpen])

/** S19: streaming sequence/funnel-instance matching — the stateful
  * twin of q102 ([[graft.operators.Sequence.funnelInstances]]).
  *
  * The batch operator binds each step to the FIRST qualifying event
  * strictly after the previous one; "first" is an event-TIME claim,
  * and micro-batches arrive in PROCESSING order — so a correct
  * streaming form cannot bind eagerly. This operator buffers each
  * user's events in state and feeds them to the binding automaton
  * only once the watermark passes them, in strict (ts, event_id)
  * order: every binding decision is made exactly once, on exactly the
  * prefix of the stream that can no longer change — bit-equal to the
  * batch chain however the stream is chopped (the spec's claim).
  *
  * Instances FAIL in two ways, both decided watermark-safely: the
  * first qualifying event lands past the step's gap (no backtracking,
  * the batch rule), or the watermark passes `prevStep + gap` with no
  * qualifying event buffered — nothing that could still arrive can
  * bind, so the instance settles with nulls from the failed step on.
  * An event-time timeout at the earliest pending deadline wakes idle
  * groups so failures emit without needing another event for that
  * user.
  *
  * State is BOUNDED by construction: the buffer holds only events
  * inside the watermark lag, and every open instance dies within
  * `Σ gaps` of its anchor (bound, fail, or time out) — state is
  * O(events in lag window + anchors in gap window) per user, never
  * the history. At 100 TB-rate ingest that is the difference between
  * a state store and a second copy of the stream.
  */
object FunnelStream {

  def apply(
      events: Dataset[FunnelEv],
      anchorType: String,
      steps: Seq[(String, Long)],
      watermarkDelay: String = "1 hour"): Dataset[FunnelMatch] = {
    require(steps.nonEmpty, "a sequence needs at least one step")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(anchorType, steps.toList))
  }

  private def tsUs(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + (t.getNanos / 1000L) % 1000000L

  /** One settled step of the automaton, API-agnostic: what settled,
    * what stays buffered, what stays open, and the earliest
    * microsecond the watermark must pass to make more progress. */
  private[streaming] final case class Advance(
      settled: List[FunnelMatch],
      hold: Seq[FunnelBuf],
      alive: List[FunnelOpen],
      wakeUs: Option[Long])

  /** The binding automaton — shared verbatim by the
    * flatMapGroupsWithState form (S19) and the transformWithState
    * form (S21), so the two APIs cannot drift semantically: merge,
    * order, process the <-watermark prefix, settle deadline
    * failures, report the next wake point. */
  private[streaming] def advance(
      anchorType: String,
      steps: List[(String, Long)],
      userId: Long,
      buffered: Seq[FunnelBuf],
      incoming: Seq[FunnelBuf],
      prevOpen: Seq[FunnelOpen],
      cutoffUs: Long): Advance = {
    val (ready, hold) = (buffered ++ incoming)
      .sortBy(b => (b.tsUs, b.eventId))
      .partition(_.tsUs < cutoffUs)

    var open = prevOpen.toList
    val settled = List.newBuilder[FunnelMatch]
    def pending(o: FunnelOpen): Int = o.boundUs.length
    def prevT(o: FunnelOpen): Long = o.boundUs.lastOption.getOrElse(o.t0Us)
    def settle(o: FunnelOpen): Unit =
      settled += FunnelMatch(userId, o.t0Us, o.boundUs, 1 + o.boundUs.length): Unit

    for (e <- ready) {
      // bindings before the anchor check: an event may bind earlier
      // instances AND anchor a new one (strictly-after keeps it from
      // binding the instance it just opened)
      open = open.flatMap { o =>
        val (typ, gap) = steps(pending(o))
        if (e.eventType == typ && e.tsUs > prevT(o)) {
          if (e.tsUs - prevT(o) <= gap) {
            val o2 = o.copy(boundUs = o.boundUs :+ e.tsUs)
            if (o2.boundUs.length == steps.length) { settle(o2); None }
            else Some(o2)
          } else { settle(o); None } // first qualifying event out of gap
        } else Some(o)
      }
      if (e.eventType == anchorType) open = FunnelOpen(e.tsUs, Vector.empty) :: open
    }

    // deadline failures: every event at-or-before prevT+gap has been
    // processed (deadline < cutoff ⇒ its whole window is < cutoff),
    // so nothing can bind this step anymore
    val (dead, alive) = open.partition(o => prevT(o) + steps(pending(o))._2 < cutoffUs)
    dead.foreach(settle)

    // wake at the earliest thing the watermark can settle: a pending
    // deadline (failure emission) OR the earliest BUFFERED event (a
    // group whose chain exists only in the buffer gets no more
    // data-driven invocations — without this wake it would sleep
    // forever)
    val wake = (alive.map(o => prevT(o) + steps(pending(o))._2) ++
      hold.headOption.map(_.tsUs)).minOption
    Advance(settled.result(), hold, alive, wake)
  }

  /** One group invocation — new data and timeout wake-ups share the
    * same path. */
  private[streaming] def update(anchorType: String, steps: List[(String, Long)])(
      userId: Long,
      rows: Iterator[FunnelEv],
      state: GroupState[FunnelState]): Iterator[FunnelMatch] = {
    val prev = state.getOption.getOrElse(FunnelState(Nil, Nil))
    val incoming = rows.map(e => FunnelBuf(tsUs(e.ts), e.event_id, e.event_type)).toSeq
    val cutoffUs = state.getCurrentWatermarkMs * 1000L
    val a = advance(anchorType, steps, userId, prev.buffer, incoming, prev.open, cutoffUs)

    if (a.alive.isEmpty && a.hold.isEmpty) {
      if (state.exists) state.remove()
    } else {
      state.update(FunnelState(a.hold, a.alive))
      // clamp above the watermark (Spark rejects a timeout at-or-behind it)
      a.wakeUs.foreach { w =>
        state.setTimeoutTimestamp(
          math.max(w / 1000L + 1L, state.getCurrentWatermarkMs + 1L))
      }
    }
    a.settled.iterator
  }

  private[streaming] def toBuf(e: FunnelEv): FunnelBuf =
    FunnelBuf(tsUs(e.ts), e.event_id, e.event_type)
}
