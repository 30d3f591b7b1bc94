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
        val oneVectorPerId = canonicalBatch(batch, idCol, vecCol)
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
        val nextSeq = nextBatchSeq(spark, tablePath)
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

  /** ONE embedding per id within a micro-batch: two updates for the
    * same vector in one batch would tie on the version and let
    * keepLatest pick per-TABLE winners from different embeddings — an
    * index state consistent with neither. The winner is the
    * lexicographically greatest payload (arrays of orderable types
    * order element-wise in Spark), NOT dropDuplicates' arbitrary row:
    * a crash-replay of the same batch must re-pick the SAME embedding
    * or the replay writes different buckets at a higher seq and the
    * no-op guarantee quietly narrows to duplicate-free batches. */
  private[graft] def canonicalBatch(
      batch: DataFrame, idCol: String, vecCol: String): DataFrame =
    batch
      .select(col(idCol), col(vecCol))
      .groupBy(col(idCol))
      .agg(org.apache.spark.sql.functions.max(col(vecCol)).as(vecCol))

  /** The table's next version: max(batch_seq)+1, or 0 only when the
    * table genuinely does not exist yet. Any OTHER read failure
    * (transient storage error on a populated table) must abort the
    * batch — swallowing it would reset the sequence to 0 and every
    * row in this batch would silently lose to persisted higher-seq
    * rows in keepLatest, keeping stale buckets. */
  private[graft] def nextBatchSeq(
      spark: org.apache.spark.sql.SparkSession, tablePath: String): Long = {
    val prev =
      try {
        val r = spark.read.parquet(tablePath)
          .agg(org.apache.spark.sql.functions.max(col("batch_seq"))).head()
        if (r.isNullAt(0)) -1L else r.getLong(0)
      } catch {
        // "no table yet": the path is absent, or exists but holds no
        // data files (a pre-created sink dir before the first commit).
        // Data-file CORRUPTION surfaces at execution time as a
        // SparkException, which deliberately falls through.
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(c =>
              c.contains("PATH_NOT_FOUND") || c.contains("UNABLE_TO_INFER_SCHEMA")) ||
              e.getMessage.contains("Path does not exist") => -1L
        case _: java.io.FileNotFoundException => -1L
      }
    prev + 1L
  }
}
