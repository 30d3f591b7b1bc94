package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.Ingest

/** S7: the reference's ingest loop as a streaming sink — every
  * micro-batch of updates is applied to a partitioned parquet table
  * through [[Ingest.incrementalRefresh]] (keep-newest-per-key upsert +
  * dynamic overwrite of ONLY the touched partitions), exactly the
  * DELETE+INSERT refresh the reference's API pullers run per batch
  * (dune_transfers_updates, coingecko_market_data.py:317-380).
  *
  * Restartable BY CONSTRUCTION, the property the reference gets from
  * idempotent DELETE+INSERT: re-applying a batch after a crash/restart
  * is a no-op, because keep-newest-per-key over rows already present
  * changes nothing — `StreamingSpec` proves replay idempotency
  * byte-for-byte. State lives in the TABLE, not the stream: the
  * foreachBatch boundary is where Structured Streaming hands
  * exactly-once responsibility to an idempotent sink.
  */
object UpsertSink {

  /** Start upserting a stream of updates into the partitioned table
    * at `tablePath`. One refresh per micro-batch; each refresh reads
    * and rewrites only the partitions that batch touches.
    *
    * @param checkpointLocation REQUIRED for real restartability: the
    *   sink's idempotency only pays off when the restarted query
    *   resumes from committed offsets — without a checkpoint a
    *   replayable source (files) reprocesses all history (safe but
    *   wasteful) and a latest-offset source (Kafka) silently SKIPS
    *   everything between crash and restart. Tests may omit it for
    *   in-memory sources. */
  def start(
      updates: DataFrame,
      tablePath: String,
      stagingPath: String,
      keys: Seq[String],
      versionCols: Seq[Column],
      partitionCols: Seq[String],
      checkpointLocation: Option[String] = None): StreamingQuery = {
    val writer = updates.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Ingest.incrementalRefresh(
          tablePath, batch, keys, versionCols, partitionCols, stagingPath)
      }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _)).start()
  }
}
