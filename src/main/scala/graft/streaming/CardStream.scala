package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.Publish
import graft.text.TextOps

/** S31: streaming maintenance of the corpus DATA CARD (q165) — the
  * composition showcase of the maintenance matrix: per-source
  * datasheet numbers that stay exact while the corpus streams in,
  * instead of a nightly full re-derive.
  *
  * The card's measures split two ways:
  *
  *   - everything additive (doc counts, BPE token sums, short-doc
  *     counts, quality sums) maintains exactly through [[AggTableSink]]
  *     — integer addition is associative, so the maintained numbers
  *     are independent of how the stream was chopped into batches;
  *   - the two NON-additive measures ride the index GRAIN instead of
  *     extra state: the maintained table is keyed
  *     `(fp, source, lang)` — `n_langs` is a distinct-count over the
  *     grain, and corpus-wide dup membership (a text duplicated
  *     ACROSS sources or batches counts in every source holding a
  *     copy, q165's semantics) re-derives from the fingerprint
  *     totals. A batch arriving later can flip EARLIER copies into
  *     dup membership — which no per-source additive counter can
  *     express, and the fingerprint-grain table expresses for free.
  *
  * State is ∝ distinct `(fp, source, lang)` triples — the honest cost
  * of streaming dup membership (the same fingerprint table q164's
  * exact gate probes); the rows are 3 keys + 5 longs, narrow enough
  * that at 100 TB of text the index is ~1/1000th of the corpus.
  * Serving the card is one |index|-row aggregate down to |sources|
  * rows — never a corpus re-scan, never a text re-parse.
  *
  * Exactly-once is S18's argument verbatim: addition is not
  * idempotent, so the guarantee comes from the commit layer — the
  * micro-batch id rides the manifest inside Publish's atomic pointer
  * flip and a replayed batch is refused before any arithmetic
  * happens ([[AggTableSink.applyBatch]]).
  *
  * Contract (CardStreamSpec): after any prefix of batches,
  * [[card]] ≡ [[TextOps.corpusCard]] over exactly the documents
  * ingested so far — including the cross-batch dup flip and
  * kill-and-restart through the checkpoint. */
object CardStream {

  private val Measures = Seq("bpe", "short_i", "q_ppm", "ws_tok")

  /** Per-document grain rows for one batch: the fingerprint/source/
    * lang key plus the four additive measures, derived exactly as
    * [[TextOps.corpusCard]] derives them (same fingerprint, same
    * BPE-ish token regex, same quality scan). Narrow map + one join
    * with the quality scan — no shuffle beyond qualityScore's own. */
  def docGrain(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      langCol: String,
      shortDocTokens: Long = 50L): DataFrame = {
    val q = TextOps.qualityScore(docs, idCol, textCol)
      .select(col(idCol), col("n_tokens"), col("quality_score_ppm"))
    docs.select(col(idCol), col(sourceCol), col(langCol),
        TextOps.fingerprintCol(col(textCol)).as("fp"),
        regexp_count(col(textCol), lit(TextOps.BpeishPattern)).cast("long").as("bpe"))
      .join(q, idCol)
      .select(col("fp"), col(sourceCol), col(langCol),
        col("bpe"),
        when(col("bpe") < shortDocTokens, 1L).otherwise(0L).as("short_i"),
        col("quality_score_ppm").cast("long").as("q_ppm"),
        col("n_tokens").cast("long").as("ws_tok"))
  }

  /** Merge one micro-batch of documents into the maintained index at
    * `root`. Returns false untouched on replay (S18's batch-id gate). */
  def applyBatch(
      batch: DataFrame,
      batchId: Long,
      root: String,
      idCol: String,
      textCol: String,
      sourceCol: String,
      langCol: String,
      shortDocTokens: Long = 50L): Boolean =
    AggTableSink.applyBatch(
      docGrain(batch, idCol, textCol, sourceCol, langCol, shortDocTokens),
      batchId, root,
      groupCols = Seq("fp", sourceCol, langCol),
      sumCols = Measures, countCol = "n_docs")

  /** Start maintaining the card index from a document stream. */
  def start(
      docs: DataFrame,
      root: String,
      idCol: String,
      textCol: String,
      sourceCol: String,
      langCol: String,
      shortDocTokens: Long = 50L,
      checkpointLocation: Option[String] = None): StreamingQuery = {
    val writer = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, root, idCol, textCol, sourceCol, langCol,
          shortDocTokens): Unit
      }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /** Serve the data card from the maintained index — column-for-column
    * [[TextOps.corpusCard]]'s output over the ingested documents.
    * Dup membership re-derives from corpus-wide fingerprint totals
    * (sum over every source and lang holding a copy), so a source's
    * `n_dup_docs` reflects duplicates that arrived in ANY batch. */
  def card(spark: SparkSession, root: String, sourceCol: String, langCol: String): DataFrame = {
    val idx = Publish.read(spark, root)
    val dupFp = idx.groupBy(col("fp"))
      .agg(sum("n_docs").as("__t")).where(col("__t") > 1)
      .select(col("fp"), lit(1L).as("__dup"))
    idx.join(dupFp, Seq("fp"), "left")
      .groupBy(col(sourceCol))
      .agg(
        sum("n_docs").as("n_docs"),
        sum("bpe").as("sum_tokens"),
        countDistinct(col(langCol)).as("n_langs"),
        sum(when(col("__dup").isNotNull, col("n_docs")).otherwise(0L)).as("n_dup_docs"),
        sum("short_i").as("__short"),
        sum("q_ppm").as("__qsum"),
        sum("ws_tok").as("__wtok"))
      .select(col(sourceCol), col("n_docs"), col("sum_tokens"),
        col("n_langs"), col("n_dup_docs"),
        expr("(__short * 1000000L) div n_docs").as("short_ppm"),
        expr("__qsum div n_docs").as("avg_quality_ppm"),
        expr("__wtok div n_docs").as("avg_ws_tokens"))
  }
}
