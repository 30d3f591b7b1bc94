package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-level input to the stateful balance tracker. */
case class Transfer(asset: String, wallet: Long, date: java.sql.Date, net_transfers: Double)

/** Output: the input row enriched with the running balance and
  * 1-based transfer sequence — the streaming twin of the batch
  * window in Tables.transfersWithBalance / q3
  * (core_coin_wallet_transfers.py:178-191). */
case class Balance(
    asset: String,
    wallet: Long,
    date: java.sql.Date,
    net_transfers: Double,
    balance: Double,
    transfer_sequence: Long)

/** Per-key carried state: last balance + sequence counter. */
case class BalState(balance: Double, seq: Long)

/** S2: stateful per-(asset, wallet) running balance via
  * flatMapGroupsWithState.
  *
  * State is two scalars per live (asset, wallet) pair — the minimal
  * footprint for exact running sums on an unbounded stream. Keys
  * hash-partition the state store, so a 1000-executor cluster holds
  * wallet-count × ~32 bytes of state, independent of event volume.
  * Within a micro-batch, rows are folded in date order; the input
  * must be at the (asset, wallet, date) grain (as Tables.transfers
  * produces) — with several same-date rows per key, within-date order
  * would be arrival-dependent and the emitted intermediate balances
  * nondeterministic.
  */
object RunningBalance {

  def apply(transfers: Dataset[Transfer]): Dataset[Balance] = {
    import transfers.sparkSession.implicits._
    transfers
      .groupByKey(t => (t.asset, t.wallet))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  private[streaming] def update(
      key: (String, Long),
      rows: Iterator[Transfer],
      state: GroupState[BalState]): Iterator[Balance] = {
    val prev = state.getOption.getOrElse(BalState(0.0, 0L))
    var bal = prev.balance
    var seq = prev.seq
    val out = rows.toSeq.sortBy(_.date.getTime).map { t =>
      bal += t.net_transfers
      seq += 1
      Balance(t.asset, t.wallet, t.date, t.net_transfers, bal, seq)
    }
    state.update(BalState(bal, seq))
    out.iterator
  }
}
