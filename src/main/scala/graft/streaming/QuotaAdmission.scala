package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Document-shaped input to the streaming quota gate. */
case class Doc(doc_id: Long, source: String, n_chars: Long)

/** Admitted output: the doc plus its 1-based admission slot. */
case class AdmittedDoc(doc_id: Long, source: String, n_chars: Long, slot: Long)

/** S11: streaming per-source quota admission — the ingest-side
  * sibling of the batch domain cap (q60).
  *
  * Batch q60 caps a FINISHED corpus, ranked by quality; an ingest
  * pipeline must make the call online, per arriving document, before
  * the corpus exists — admit the first K per source, drop the rest.
  * State via flatMapGroupsWithState is one counter per live source
  * (a few bytes; hash-partitioned across the cluster like every
  * keyed state store), so an unbounded crawl holds state proportional
  * to the SOURCE universe, never the document count.
  *
  * Semantics (documented, spec-enforced): admission is by ARRIVAL
  * order — deterministic given a deterministic source, and ties
  * within one micro-batch fold in doc_id order so replays admit the
  * same set. Quality-ranked capping remains the batch operator's
  * job; run it over the admitted table at rebuild time.
  */
object QuotaAdmission {

  def apply(docs: Dataset[Doc], quota: Int): Dataset[AdmittedDoc] = {
    require(quota > 0, "quota must be positive")
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        update(quota))
  }

  private[streaming] def update(quota: Int)(
      source: String,
      rows: Iterator[Doc],
      state: GroupState[Long]): Iterator[AdmittedDoc] = {
    var admitted = state.getOption.getOrElse(0L)
    // within-batch determinism: fold in doc_id order, not arrival
    val out = rows.toSeq.sortBy(_.doc_id).flatMap { d =>
      if (admitted < quota) {
        admitted += 1
        Some(AdmittedDoc(d.doc_id, d.source, d.n_chars, admitted))
      } else None
    }
    state.update(admitted)
    out.iterator
  }
}
