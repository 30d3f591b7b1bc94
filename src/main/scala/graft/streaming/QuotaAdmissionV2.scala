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

/** State-schema EVOLUTION demo pair (v2-only capability): the same
  * quota gate run first with [[QuotaStateV1]] (counter only), then —
  * against the SAME checkpoint — with [[QuotaStateV2]], which adds a
  * `lastDoc` field. With Avro state encoding
  * (spark.sql.streaming.stateStore.encodingFormat=avro) the store
  * restores old-schema values with the new field defaulted to None;
  * under the default UnsafeRow encoding the restart rejects the
  * changed schema outright. The emitted `prev_doc` makes the
  * evolution observable per row: -2 = written by the V1 processor
  * (field not tracked), -1 = first admission over restored V1 state
  * (None default), otherwise the previous admitted doc_id round-
  * tripped through the store. */
case class QuotaStateV1(admitted: Long)

/** Evolved form of [[QuotaStateV1]]: same counter plus the last
  * admitted doc_id. New fields must be nullable for Avro evolution —
  * hence Option. */
case class QuotaStateV2(admitted: Long, lastDoc: Option[Long])

/** Output of the evolution pair — `prev_doc` is the witness column. */
case class AdmittedTrace(doc_id: Long, source: String, slot: Long, prev_doc: Long)

class EvoQuotaProcessorV1(quota: Int)
    extends StatefulProcessor[String, Doc, AdmittedTrace] {
  @transient private var st: ValueState[QuotaStateV1] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[QuotaStateV1](
      "quota", Encoders.product[QuotaStateV1], TTLConfig.NONE)

  override def handleInputRows(
      source: String,
      rows: Iterator[Doc],
      timerValues: TimerValues): Iterator[AdmittedTrace] = {
    var n = if (st.exists()) st.get().admitted else 0L
    val out = rows.toSeq.sortBy(_.doc_id).flatMap { d =>
      if (n < quota) {
        n += 1
        Some(AdmittedTrace(d.doc_id, source, n, -2L))
      } else None
    }
    st.update(QuotaStateV1(n))
    out.iterator
  }
}

class EvoQuotaProcessorV2(quota: Int)
    extends StatefulProcessor[String, Doc, AdmittedTrace] {
  @transient private var st: ValueState[QuotaStateV2] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[QuotaStateV2](
      "quota", Encoders.product[QuotaStateV2], TTLConfig.NONE)

  override def handleInputRows(
      source: String,
      rows: Iterator[Doc],
      timerValues: TimerValues): Iterator[AdmittedTrace] = {
    val prior = if (st.exists()) st.get() else QuotaStateV2(0L, None)
    var n = prior.admitted
    var last = prior.lastDoc
    val out = rows.toSeq.sortBy(_.doc_id).flatMap { d =>
      if (n < quota) {
        n += 1
        val trace = AdmittedTrace(d.doc_id, source, n, last.getOrElse(-1L))
        last = Some(d.doc_id)
        Some(trace)
      } else None
    }
    st.update(QuotaStateV2(n, last))
    out.iterator
  }
}

object QuotaEvolution {
  private def gate(
      docs: Dataset[Doc],
      proc: StatefulProcessor[String, Doc, AdmittedTrace]): Dataset[AdmittedTrace] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(proc, TimeMode.None(), OutputMode.Append(),
        implicitly[Encoder[AdmittedTrace]])
  }

  def v1(docs: Dataset[Doc], quota: Int): Dataset[AdmittedTrace] =
    gate(docs, new EvoQuotaProcessorV1(quota))

  def v2(docs: Dataset[Doc], quota: Int): Dataset[AdmittedTrace] =
    gate(docs, new EvoQuotaProcessorV2(quota))
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
