package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.similarity.Pq
import graft.sources.Ingest

/** S22: streaming ADC search — the read side of S8's index-sink idea
  * on the COMPRESSED domain. The corpus streams in; each micro-batch
  * is encoded against a FIXED PQ codebook (trained offline — q115's
  * job; retraining and the resulting re-encode is q118's job, not
  * the stream's) and upserted into a persisted codes table; queries
  * serve asymmetric-distance top-k from the maintained table at any
  * moment without ever re-encoding the corpus.
  *
  * Why this is the 100 TB shape: the index state is |corpus|·m
  * one-byte codes (64 floats → 8 bytes), the per-batch work is
  * encode(batch) + rewrite of ≤ m partition directories (codes
  * partition by sub-space, so a batch touches at most m dirs and
  * replay rewrites the same ones), and the serving scan reads codes
  * + a broadcast |m·K| codebook — never vectors. The fixed-codebook
  * precondition is the same one S8 documents for its fixed
  * hyperplanes: batches encode independently and consistently, so
  * the maintained table is BIT-EQUAL to a batch encode of the
  * accumulated collection however the stream was chopped.
  *
  * Exactly-once is S7/S8's idempotent-sink argument: keep-newest per
  * (vec_id, sub) with a table-derived monotone sequence — a replayed
  * batch re-derives identical codes one sequence higher, a
  * content-level no-op ([[AnnIndexSink.nextBatchSeq]] explains why
  * the sequence comes from the TABLE, not the batch id); a
  * re-embedded vector's codes replace its previous ones. StreamingSpec
  * S22 proves table ≡ batch encode, re-embed replacement, replay
  * no-op, and search ≡ the q116 registry answer.
  */
object AdcSearchStream {

  /** Start maintaining the PQ codes table at `tablePath` from a
    * stream of (idCol, vecCol) vector rows, encoding against the
    * fixed `codebook` (sub, code, cvec).
    *
    * @param checkpointLocation see [[UpsertSink.start]] — required
    *   for real restartability; tests may omit it for in-memory
    *   sources. */
  def start(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      codebook: DataFrame,
      m: Int,
      dsub: Int,
      tablePath: String,
      stagingPath: String,
      checkpointLocation: Option[String] = None): StreamingQuery = {
    // the codebook is FIXED by precondition (scaladoc above): collect
    // its |m·K| rows ONCE here, outside the foreachBatch closure, so
    // each micro-batch pays only the narrow encode map — not a fresh
    // collect + literal when-chain rebuild per batch
    val localCb = codebook
      .select(col("sub"), col("code"), col("cvec")).collect()
    val writer = vectors.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val oneVectorPerId = AnnIndexSink.canonicalBatch(batch, idCol, vecCol)
        val spark = batch.sparkSession
        val nextSeq = AnnIndexSink.nextBatchSeq(spark, tablePath)
        val codes = Pq.assignCarryLocal(
            Pq.subVectors(oneVectorPerId, idCol, vecCol, m, dsub),
            localCb, idCol)
          .select(col(idCol), col("sub"), col("code"))
          .withColumn("batch_seq", lit(nextSeq))
        Ingest.incrementalRefresh(
          tablePath, codes,
          keys = Seq(idCol, "sub"),
          versionCols = Seq(col("batch_seq")),
          partitionCols = Seq("sub"),
          stagingPath)
      }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /** Serve ADC top-k for `probes` from the maintained codes table —
    * [[Pq.adcKnn]] over the persisted codes, the lookup-table join
    * against codes-not-vectors that makes the query cost independent
    * of embedding width. */
  def search(
      spark: SparkSession,
      tablePath: String,
      probes: DataFrame,
      probeIdCol: String,
      vecCol: String,
      idCol: String,
      codebook: DataFrame,
      m: Int,
      dsub: Int,
      topK: Int): DataFrame = {
    val codes = spark.read.parquet(tablePath)
      .select(col(idCol), col("sub"), col("code"))
    Pq.adcKnn(probes, probeIdCol, vecCol, codes, idCol, codebook, m, dsub, topK)
  }
}
