package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** S14: the close-out balance on the arbitrary-state v2 API — same
  * semantics as [[RunningBalanceTtl]], but the idle-key eviction
  * rides a NATIVE per-key event-time TIMER (registerTimer /
  * handleExpiredTimer) instead of flatMapGroupsWithState's implicit
  * single timeout. What the newer API buys, demonstrated here:
  * typed ValueState handles, explicit timer arithmetic (each batch
  * re-registers the key's close-out timer at last-event + idle), and
  * a dedicated expiry callback — plus capabilities the v1 API cannot
  * express at all (multiple timers per key, state TTL via TTLConfig,
  * state schema evolution), which is why the migration path matters.
  * Requires the RocksDB state store provider, like [[QuotaAdmissionV2]].
  *
  * The spec proves output parity with the v1 operator on an
  * identical batch sequence: same balances, same close-outs, same
  * fresh-epoch restarts.
  */
class BalanceCloseoutProcessor(idleMs: Long)
    extends StatefulProcessor[(String, Long), TransferTs, BalanceEvent] {

  @transient private var st: ValueState[TtlState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[TtlState](
      "bal", Encoders.product[TtlState], TTLConfig.NONE)

  override def handleInputRows(
      key: (String, Long),
      rows: Iterator[TransferTs],
      timerValues: TimerValues): Iterator[BalanceEvent] = {
    val prev = if (st.exists()) st.get() else TtlState(0.0, 0L, Long.MinValue)
    var bal = prev.balance
    var seq = prev.seq
    var last = prev.lastTsMs
    val out = rows.toSeq.sortBy(_.ts.getTime).map { t =>
      bal += t.net_transfers
      seq += 1
      last = math.max(last, t.ts.getTime)
      BalanceEvent(t.asset, t.wallet, t.ts, t.net_transfers, bal, seq,
        is_closeout = false)
    }
    st.update(TtlState(bal, seq, last))
    // one live close-out timer per key: drop the previous batch's
    // registration, arm the new horizon (clamped past the watermark,
    // same reasoning as the v1 operator)
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    getHandle.registerTimer(
      math.max(last + idleMs, timerValues.getCurrentWatermarkInMs + 1))
    out.iterator
  }

  override def handleExpiredTimer(
      key: (String, Long),
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[BalanceEvent] = {
    if (!st.exists()) Iterator.empty
    else {
      val s = st.get()
      st.clear()
      Iterator(BalanceEvent(key._1, key._2, new java.sql.Timestamp(s.lastTsMs),
        0.0, s.balance, s.seq, is_closeout = true))
    }
  }
}

object RunningBalanceTtlV2 {
  def apply(
      transfers: Dataset[TransferTs],
      idle: java.time.Duration,
      watermarkDelay: String = "1 day"): Dataset[BalanceEvent] = {
    import transfers.sparkSession.implicits._
    transfers
      .withWatermark("ts", watermarkDelay)
      .groupByKey(t => (t.asset, t.wallet))
      .transformWithState(new BalanceCloseoutProcessor(idle.toMillis),
        TimeMode.EventTime(), OutputMode.Append(), implicitly[Encoder[BalanceEvent]])
  }
}
