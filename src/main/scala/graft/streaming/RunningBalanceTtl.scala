package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time input for the TTL balance tracker ([[RunningBalanceTtl]]). */
case class TransferTs(asset: String, wallet: Long, ts: java.sql.Timestamp,
    net_transfers: Double)

/** Output of [[RunningBalanceTtl]]: balance rows plus close-out
  * markers. A close-out (is_closeout=true) carries the key's FINAL
  * balance and sequence at its last-seen event time, with
  * net_transfers 0. */
case class BalanceEvent(
    asset: String,
    wallet: Long,
    ts: java.sql.Timestamp,
    net_transfers: Double,
    balance: Double,
    transfer_sequence: Long,
    is_closeout: Boolean)

private[streaming] case class TtlState(balance: Double, seq: Long, lastTsMs: Long)

/** S2t: running balance with BOUNDED state — the unbounded-key-universe
  * form of [[RunningBalance]].
  *
  * S2 keeps one state entry per (asset, wallet) forever: correct, and
  * fine when the key universe is the wallet population. On a stream
  * whose keys grow without bound (addresses appear once and die), the
  * state store becomes the leak. This variant holds state only for
  * ACTIVE keys: when a key sees no events for `idle` (event time, via
  * EventTimeTimeout against the watermark), the operator emits one
  * CLOSE-OUT row — the key's final balance/sequence at its last event
  * time — and evicts the state.
  *
  * Contract (documented, spec-enforced): a key reappearing after its
  * close-out starts a FRESH epoch (balance and sequence restart — the
  * operator deliberately remembers nothing). The close-out rows are
  * the stitching ledger: a downstream keep-latest upsert table
  * (sources.Ingest.keepLatest / streaming.UpsertSink) keyed on
  * (asset, wallet) holds each key's last known balance, so epoch
  * stitching is one join at read time. This is the same
  * close-out-and-reseed shape the reference's always-on transfer
  * loops use between rebuilds (dune_transfers_updates), and the same
  * trade S6b makes for dedup (exact within the horizon, bounded state
  * beyond it).
  *
  * The timeout timestamp is clamped above the current watermark —
  * Spark rejects a timeout at-or-behind it (a key whose last event
  * is already older than (watermark − idle) times out at the next
  * batch boundary, which is exactly the intended semantics).
  */
object RunningBalanceTtl {

  def apply(
      transfers: Dataset[TransferTs],
      idle: java.time.Duration,
      watermarkDelay: String = "1 day"): Dataset[BalanceEvent] = {
    import transfers.sparkSession.implicits._
    transfers
      .withWatermark("ts", watermarkDelay)
      .groupByKey(t => (t.asset, t.wallet))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(idle.toMillis))
  }

  private[streaming] def update(idleMs: Long)(
      key: (String, Long),
      rows: Iterator[TransferTs],
      state: GroupState[TtlState]): Iterator[BalanceEvent] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(BalanceEvent(key._1, key._2, new java.sql.Timestamp(s.lastTsMs),
        0.0, s.balance, s.seq, is_closeout = true))
    } else {
      val prev = state.getOption.getOrElse(TtlState(0.0, 0L, Long.MinValue))
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
      state.update(TtlState(bal, seq, last))
      state.setTimeoutTimestamp(math.max(last + idleMs, state.getCurrentWatermarkMs + 1))
      out.iterator
    }
  }
}
