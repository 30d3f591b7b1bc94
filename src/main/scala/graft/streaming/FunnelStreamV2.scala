package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** S21: the sequence matcher on the arbitrary-state v2 API — the
  * hardest state shape in the repo (a per-key event BUFFER plus a
  * list of open instances) ported to transformWithState, sharing
  * [[FunnelStream.advance]] VERBATIM so the two APIs cannot drift:
  * the v1/v2 pair differ only in how state and wake-ups are plumbed.
  *
  * What v2 buys here, concretely: the buffer and the open-instance
  * list live in TWO typed ListState handles (appendValue for the
  * per-row buffer instead of rewriting one blob per batch — on the
  * RocksDB store that is an append, not a read-modify-write of the
  * whole buffer), and wake-ups are explicit per-key event-time
  * timers (registerTimer at the automaton's reported wake point)
  * rather than the v1 API's single implicit timeout. Same settle
  * semantics, same chop invariance — the spec proves output parity
  * with S19 on the panel and on testdata.
  */
class FunnelProcessor(anchorType: String, steps: List[(String, Long)])
    extends StatefulProcessor[Long, FunnelEv, FunnelMatch] {

  @transient private var buf: ListState[FunnelBuf] = _
  @transient private var open: ListState[FunnelOpen] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[FunnelBuf](
      "buf", Encoders.product[FunnelBuf], TTLConfig.NONE)
    open = getHandle.getListState[FunnelOpen](
      "open", Encoders.product[FunnelOpen], TTLConfig.NONE)
  }

  private def run(
      userId: Long,
      incoming: Seq[FunnelBuf],
      timerValues: TimerValues): Iterator[FunnelMatch] = {
    val a = FunnelStream.advance(
      anchorType, steps, userId,
      buf.get().toSeq, incoming, open.get().toSeq,
      cutoffUs = timerValues.getCurrentWatermarkInMs * 1000L)
    if (a.hold.isEmpty) buf.clear() else buf.put(a.hold.toArray)
    if (a.alive.isEmpty) open.clear() else open.put(a.alive.toArray)
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    if (a.hold.nonEmpty || a.alive.nonEmpty)
      a.wakeUs.foreach { w =>
        getHandle.registerTimer(
          math.max(w / 1000L + 1L, timerValues.getCurrentWatermarkInMs + 1L))
      }
    a.settled.iterator
  }

  override def handleInputRows(
      userId: Long,
      rows: Iterator[FunnelEv],
      timerValues: TimerValues): Iterator[FunnelMatch] =
    run(userId, rows.map(FunnelStream.toBuf).toSeq, timerValues)

  override def handleExpiredTimer(
      userId: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[FunnelMatch] =
    run(userId, Nil, timerValues)
}

object FunnelStreamV2 {
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
      .transformWithState(new FunnelProcessor(anchorType, steps.toList),
        TimeMode.EventTime(), OutputMode.Append(),
        implicitly[Encoder[FunnelMatch]])
  }
}
