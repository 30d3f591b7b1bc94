package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink surface: how graft tables land on storage at scale.
  *
  * The reference's sinks are BigQuery tables refreshed by
  * DELETE+INSERT; the Spark-native equivalents are layout decisions
  * that the next reader's plan can exploit:
  *
  *   - `writePartitioned`: hive-style directory partitioning → the
  *     reader's WHERE on the partition column prunes whole
  *     directories (PartitionFilters in the scan, zero I/O for
  *     untouched partitions). Pair with `keepLatest` upserts so an
  *     incremental refresh rewrites only touched partitions
  *     (dynamic partition overwrite).
  *   - `writeBucketed`: hash-bucketed + sorted table layout → joins
  *     and aggregations on the bucket key skip their shuffle
  *     entirely; this is how the (asset, wallet) pipelines avoid
  *     re-shuffling the fact table every run at 100 TB.
  */
object Sinks {

  /** Directory-partitioned parquet write with dynamic partition
    * overwrite (only partitions present in `df` are replaced). */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed + sorted managed table (requires a catalog; bucket
    * metadata only survives via saveAsTable). numBuckets should be
    * sized so a bucket's largest partition fits an executor's memory
    * at the target scale. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Seq.empty,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    // Overwrite must be idempotent ACROSS sessions: the default
    // in-memory catalog forgets the table when the JVM exits but its
    // warehouse directory survives, and saveAsTable then fails with
    // LOCATION_ALREADY_EXISTS. Clear the location ONLY when the
    // catalog does not know the table (i.e. it is an orphan from a
    // dead session) — when the table is live, saveAsTable's own
    // Overwrite handling runs with its safety checks intact (a
    // pre-drop here would destroy the old data before the new write
    // is even validated, e.g. on a self-read plan or a bad column).
    if (mode == SaveMode.Overwrite && !df.sparkSession.catalog.tableExists(table))
      dropTable(df.sparkSession, table)
    val w = df.write.mode(mode).bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.format("parquet").saveAsTable(table)
  }

  /** Sharded training-data write — q59's write path made concrete:
    * one shuffle routes every row to its shard, rows are SORTED
    * WITHIN each shard by the scramble order (no global sort — a
    * total ORDER BY would funnel 100 TB through one range
    * partitioner; here each shard streams out as one independent
    * sorted run), and `partitionBy` lands hive-style
    * `shard=N/part-*.parquet` directories a training loader can read
    * shard-parallel. `repartition(n, col)` puts each shard value in
    * exactly one task (hash partitioning; two shards may share a
    * task, never split), so each shard directory holds exactly ONE
    * sorted file — the deterministic, resumable layout a data
    * loader wants.
    *
    * @param orderCols within-shard sort columns (the scramble order)
    */
  def writeShards(
      df: DataFrame,
      path: String,
      shardCol: String,
      nShards: Int,
      orderCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    // shardCol LEADS the sort: FileFormatWriter requires output rows
    // ordered by the partition columns and inserts its own (order-
    // destroying) sort unless the existing ordering already has them
    // as a prefix — with shardCol first, the writer reuses this sort
    // and the scramble order survives into the files
    df.repartition(nShards, col(shardCol))
      .sortWithinPartitions((shardCol +: orderCols).map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(shardCol)
      .parquet(path)
  }

  /** Drop a managed table AND its warehouse directory — DROP TABLE
    * alone cannot remove a location orphaned by a previous session
    * (the in-memory catalog never knew about it). */
  def dropTable(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(wh, table.toLowerCase)
    deleteRecursively(loc)
  }

  /** Recursive directory delete (no-op if absent) — the ONE place the
    * walk/reverse/delete dance lives. */
  def deleteRecursively(loc: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(loc)
      val paths = try walk.iterator().asScala.toSeq finally walk.close()
      paths.reverseIterator.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
}
