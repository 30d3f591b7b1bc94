package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** S13: per-source quota admission on Spark 4's arbitrary-state v2
  * API (`transformWithState` + [[StatefulProcessor]]) — the same
  * semantics as [[QuotaAdmission]]'s flatMapGroupsWithState form,
  * re-expressed on the API generation that adds typed state handles
  * (ValueState/ListState/MapState), native state TTL (TTLConfig),
  * timers, and state schema evolution. The spec proves the two
  * implementations emit IDENTICAL admissions on the same input —
  * the migration path for every custom-state operator in this
  * package, verified on its simplest representative.
  *
  * Requires the RocksDB state store provider
  * (spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider) — transformWithState is not
  * supported on the default HDFS-backed store. State is one
  * ValueState[Long] counter per live source, exactly the
  * flatMapGroupsWithState footprint.
  */
class QuotaProcessor(quota: Int) extends StatefulProcessor[String, Doc, AdmittedDoc] {
  @transient private var admitted: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    admitted = getHandle.getValueState[Long](
      "admitted", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      source: String,
      rows: Iterator[Doc],
      timerValues: TimerValues): Iterator[AdmittedDoc] = {
    var n = if (admitted.exists()) admitted.get() else 0L
    // same within-batch determinism contract as QuotaAdmission:
    // fold in doc_id order so replays admit the same set
    val out = rows.toSeq.sortBy(_.doc_id).flatMap { d =>
      if (n < quota) {
        n += 1
        Some(AdmittedDoc(d.doc_id, d.source, d.n_chars, n))
      } else None
    }
    admitted.update(n)
    out.iterator
  }
}

object QuotaAdmissionV2 {
  def apply(docs: Dataset[Doc], quota: Int): Dataset[AdmittedDoc] = {
    require(quota > 0, "quota must be positive")
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .transformWithState(new QuotaProcessor(quota),
        TimeMode.None(), OutputMode.Append(), implicitly[Encoder[AdmittedDoc]])
  }

  /** Rolling-window variant via NATIVE state TTL (v2-only): the
    * quota counter itself expires `window` after its last write, so
    * a source that goes quiet gets a fresh allowance — "at most K
    * per source per activity window" instead of "K ever". State TTL
    * is processing-time based and enforced by the store (TTLConfig),
    * with no timer or timeout code in the processor at all — the
    * capability flatMapGroupsWithState cannot express. */
  def rollingWindow(
      docs: Dataset[Doc],
      quota: Int,
      window: java.time.Duration): Dataset[AdmittedDoc] = {
    require(quota > 0, "quota must be positive")
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .transformWithState(new TtlQuotaProcessor(quota, window),
        TimeMode.ProcessingTime(), OutputMode.Append(), implicitly[Encoder[AdmittedDoc]])
  }
}

/** [[QuotaProcessor]] with a TTL'd counter — see
  * [[QuotaAdmissionV2.rollingWindow]]. */
class TtlQuotaProcessor(quota: Int, window: java.time.Duration)
    extends StatefulProcessor[String, Doc, AdmittedDoc] {
  @transient private var admitted: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    admitted = getHandle.getValueState[Long](
      "admitted", Encoders.scalaLong, TTLConfig(window))

  override def handleInputRows(
      source: String,
      rows: Iterator[Doc],
      timerValues: TimerValues): Iterator[AdmittedDoc] = {
    // an expired value reads as absent — the TTL is the reset
    var n = if (admitted.exists()) admitted.get() else 0L
    val out = rows.toSeq.sortBy(_.doc_id).flatMap { d =>
      if (n < quota) {
        n += 1
        Some(AdmittedDoc(d.doc_id, d.source, d.n_chars, n))
      } else None
    }
    admitted.update(n)
    out.iterator
  }
}
