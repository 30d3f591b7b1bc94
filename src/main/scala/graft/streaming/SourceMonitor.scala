package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** S16: the LAST untested v2 composition — native state TTL and
  * timers in ONE processor. A per-source ingest monitor:
  *
  *   - the admission allowance is a TTL'd counter ([[TtlQuotaProcessor]]'s
  *     rolling-window semantics: the STORE expires it `window` after
  *     its last write, so a lull refreshes the allowance with no
  *     timer code);
  *   - a per-key processing-time TIMER fires `idle` after the
  *     source's last batch and emits a close-out DIGEST row (total
  *     admitted across all allowance windows, last admitted doc),
  *     clearing the non-TTL'd totals state — [[BalanceCloseoutProcessor]]'s
  *     close-out pattern.
  *
  * The two mechanisms answer different lifecycle questions (allowance
  * reset mid-activity vs end-of-activity flush) and only compose in
  * TimeMode.ProcessingTime: state TTL is processing-time-only (the
  * engine rejects TTLConfig under event time —
  * `cannotProvideTTLConfigForTimeMode`), which is itself a fact this
  * operator documents by existing. Requires the RocksDB provider like
  * every transformWithState operator here.
  */
class SourceMonitorProcessor(quota: Int, windowMs: Long, idleMs: Long)
    extends StatefulProcessor[String, Doc, MonitorEvent] {

  @transient private var admitted: ValueState[Long] = _
  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    admitted = getHandle.getValueState[Long]("admitted",
      Encoders.scalaLong, TTLConfig(java.time.Duration.ofMillis(windowMs)))
    totals = getHandle.getValueState[(Long, Long)]("totals",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
  }

  override def handleInputRows(
      source: String,
      rows: Iterator[Doc],
      timerValues: TimerValues): Iterator[MonitorEvent] = {
    // an expired allowance reads as absent — the TTL is the reset
    var n = if (admitted.exists()) admitted.get() else 0L
    var (total, lastDoc) =
      if (totals.exists()) totals.get() else (0L, -1L)
    val out = rows.toSeq.sortBy(_.doc_id).flatMap { d =>
      if (n < quota) {
        n += 1
        total += 1
        lastDoc = d.doc_id
        Some(MonitorEvent(d.doc_id, source, n, total, is_digest = false))
      } else None
    }
    admitted.update(n)
    totals.update((total, lastDoc))
    // one live idle timer per key, re-armed every batch
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs() + idleMs)
    out.iterator
  }

  override def handleExpiredTimer(
      source: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[MonitorEvent] = {
    if (!totals.exists()) Iterator.empty
    else {
      val (total, lastDoc) = totals.get()
      totals.clear()
      Iterator(MonitorEvent(lastDoc, source, 0L, total, is_digest = true))
    }
  }
}

/** Output of [[SourceMonitor]]: admissions carry their within-window
  * slot; the idle digest row carries slot 0, the epoch total, and the
  * last admitted doc id. */
case class MonitorEvent(
    doc_id: Long, source: String, slot: Long, total: Long, is_digest: Boolean)

object SourceMonitor {
  def apply(
      docs: Dataset[Doc],
      quota: Int,
      window: java.time.Duration,
      idle: java.time.Duration): Dataset[MonitorEvent] = {
    require(quota > 0, "quota must be positive")
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .transformWithState(
        new SourceMonitorProcessor(quota, window.toMillis, idle.toMillis),
        TimeMode.ProcessingTime(), OutputMode.Append(),
        implicitly[Encoder[MonitorEvent]])
  }
}
