package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.similarity.Ann
import graft.sources.Ingest

/** S8: streaming ANN index maintenance — every micro-batch of new or
  * updated vectors is hashed with the SAME fixed hyperplane set (the
  * plane literals depend only on seed/dim/tables/bits, so each batch
  * hashes independently and consistently) and upserted into a
  * persisted LSH bucket table through the S7 idempotent-refresh
  * pattern ([[UpsertSink]]): keys (id, lsh_table), partitioned by
  * lsh_table, so one micro-batch rewrites at most `numTables`
  * partitions and replaying a batch after a crash is a byte-level
  * no-op. The maintained table IS [[Ann.lshBucketTable]] of the
  * accumulated collection (StreamingSpec S8 proves set equality and
  * replay idempotency) — query-side ANN joins it on (lsh_table,
  * bucket) without ever re-hashing the corpus, which is the entire
  * point of index maintenance at 100 TB: the corpus streams in, the
  * index stays current, and a full rebuild never happens.
  */
object AnnIndexSink {

  /** Start maintaining the LSH bucket table at `tablePath` from a
    * stream of (idCol, vecCol) vector rows. Re-keyed vectors replace
    * their previous bucket rows (keep-newest upsert per (id, table)).
    *
    * @param checkpointLocation see [[UpsertSink.start]] — required for
    *   real restartability; tests may omit it for in-memory sources. */
  def start(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      tablePath: String,
      stagingPath: String,
      numTables: Int = 12,
      bitsPerTable: Int = 4,
      seed: Long = 42L,
      checkpointLocation: Option[String] = None): StreamingQuery = {
    val writer = vectors.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // ONE embedding per id within the batch: two updates for the
        // same vector in one micro-batch would tie on the version and
        // let keepLatest pick per-TABLE winners from different
        // embeddings — an index state consistent with neither. Row
        // order inside a micro-batch is not meaningful at this API
        // level, so the winner is arbitrary but the buckets it yields
        // are all from the same embedding.
        val oneVectorPerId = batch.dropDuplicates(Seq(idCol))
        // version = the table's own high-water mark + 1, NOT the raw
        // batchId: keepLatest keeps the max version, and (a) a
        // re-embedded vector's new bucket can be numerically smaller
        // (bucket-as-version kept stale rows), while (b) batchId
        // resets to 0 when the stream restarts with a fresh
        // checkpoint — every update would then lose to the persisted
        // higher sequence until batchId caught up. Deriving from the
        // TABLE makes the sequence monotone over the table's whole
        // lifetime; a same-batchId replay writes identical buckets
        // one sequence higher, so replay stays a content-level no-op
        // (StreamingSpec S8 proves it).
        val spark = batch.sparkSession
        val nextSeq = (try {
          spark.read.parquet(tablePath).agg(
            org.apache.spark.sql.functions.max(col("batch_seq"))).head().getLong(0)
        } catch { case _: Exception => -1L }) + 1L
        val buckets = Ann.lshBucketTable(oneVectorPerId, idCol, vecCol, numTables, bitsPerTable, seed)
          // durable-table column names (the partition directory name
          // must not look like a hidden path, and a persisted schema
          // should not leak plan-internal __ prefixes)
          .select(col(idCol), col("__table").as("lsh_table"), col("__bucket").as("bucket"))
          .withColumn("batch_seq", org.apache.spark.sql.functions.lit(nextSeq))
        Ingest.incrementalRefresh(
          tablePath, buckets,
          keys = Seq(idCol, "lsh_table"),
          versionCols = Seq(col("batch_seq")),
          partitionCols = Seq("lsh_table"),
          stagingPath)
      }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _)).start()
  }
}
