package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.Publish
import graft.text.Perplexity

/** S35: streaming perplexity admission — q172's CCNet-style bigram LM
  * run as a crawl-ingest fluency gate (Wenzek et al.'s posture: the
  * model is trained ONCE on a curated reference and held FIXED; the
  * reference pipelines apply exactly this shape of model-scored
  * filtering between crawl and corpus).
  *
  * The complement of S34's distribution gate on the same commit
  * spine: DSIR asks "does this look like the target mix?", this asks
  * "is this fluent prose at all?" — a word-salad document built from
  * perfectly target-like vocabulary passes every heuristic and the
  * distribution gate, but its improbable bigram ORDER scores high
  * cross-entropy here and is rejected. Because the model is fixed,
  * there is no per-batch stats maintenance: admission is a pure
  * function of (model, document), independent of arrival order —
  * the deliberate contrast with S34's stated prefix-dependence.
  *
  * Per batch: one zip_with bigram pass over batch text, model joins
  * bounded by the published reference (AQE broadcasts them while they
  * fit), one map-side-combined per-doc aggregate, one admitted-rows
  * append — batch-sized work against a fixed-size model. Scoring is
  * [[Perplexity.scoreAgainst]] verbatim (exact integer counts, one
  * rounded-decimal −ln P per bigram), so a doc's ce here equals its
  * q172 ce under the same reference. Exactly-once is [[AppendStream]]'s
  * batch-id refusal on the single corpus root — the model tables are
  * write-once at setup and never touched by the stream. */
object PerplexityAdmitStream {

  private def bigramsRoot(modelRoot: String) = s"$modelRoot/bigrams"
  private def vocabRoot(modelRoot: String) = s"$modelRoot/vocab"

  /** Train and publish the FIXED bigram model once (idempotent): the
    * exact (p, w, cpw) counts and distinct vocabulary of the curated
    * reference slice ([[Perplexity.trainBigramModel]]). The bigrams
    * root is the COMMIT MARKER and publishes LAST: a crash between
    * the two publishes leaves only the vocab table, and the retry —
    * keyed on the marker — completes the model instead of skipping
    * the missing half (each member is individually guarded, so
    * nothing double-publishes either). */
  def publishModel(
      refDocs: DataFrame,
      idCol: String,
      textCol: String,
      modelRoot: String): Unit =
    if (Publish.currentVersion(bigramsRoot(modelRoot)).isEmpty) {
      val (bigrams, vocab) = Perplexity.trainBigramModel(refDocs, idCol, textCol)
      if (Publish.currentVersion(vocabRoot(modelRoot)).isEmpty)
        Publish.publish(vocab, vocabRoot(modelRoot)): Unit
      Publish.publish(bigrams, bigramsRoot(modelRoot)): Unit
    }

  /** Score `docs` against the published model: (id, n_bigrams, __ce). */
  def score(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      modelRoot: String): DataFrame =
    Perplexity.scoreAgainst(docs, idCol, textCol,
      Publish.read(spark, bigramsRoot(modelRoot)),
      Publish.read(spark, vocabRoot(modelRoot)))

  /** Fold one micro-batch: score against the fixed model, append
    * documents whose mean cross-entropy clears the ceiling (ce ≤
    * `maxCe`, in nats). Bigram-less docs (null ce — too short to be
    * prose) are rejected. Returns false untouched on replay. */
  def applyBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      maxCe: Double,
      modelRoot: String,
      corpusRoot: String): Boolean = {
    if (AppendStream.lastBatch(corpusRoot).exists(_ >= batchId)) return false
    val spark = batch.sparkSession
    val admitted = batch.join(
      score(spark, batch, idCol, textCol, modelRoot)
        .where(col("__ce").isNotNull && col("__ce") <= lit(maxCe))
        .select(col(idCol), round(col("__ce"), 6).as("ce")),
      Seq(idCol))
    AppendStream.applyBatch(admitted, batchId, corpusRoot)
  }

  /** Start the fluency gate over a document stream. */
  def start(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxCe: Double,
      modelRoot: String,
      corpusRoot: String,
      checkpointLocation: Option[String] = None): StreamingQuery = {
    val writer = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, idCol, textCol, maxCe,
          modelRoot, corpusRoot): Unit
      }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  def lastBatch(corpusRoot: String): Option[Long] =
    AppendStream.lastBatch(corpusRoot)
}
