package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.WindowOps

/** Ingestion-side operators: the Spark-native forms of the
  * reference's API-pull pipelines (coingecko/geckoterminal JSON blob
  * parsing, dune/ethereum transfer updates, macro_trends uploads):
  * semi-structured normalization, incremental upsert, and
  * multi-source entity resolution.
  *
  * The reference does these row-at-a-time in Python against BigQuery
  * (parse JSON per blob, DELETE+INSERT per batch, coalesce in SQL);
  * here each is one distributed plan: `from_json` is a codegen'd
  * expression evaluated at scan speed, upsert is a window dedupe that
  * shuffles once on the key, resolution is one full-outer join.
  */
object Ingest {

  /** Schema-enforced CSV reader (macro_trends_upload's CSV→typed
    * table path): explicit DDL schema (never inferSchema — a schema
    * inference pass reads the data twice and types drift run-to-run),
    * corrupt rows quarantined into `_corrupt_record` instead of
    * failing the job. */
  def readCsv(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      ddl: String,
      header: Boolean = true,
      timestampFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame = {
    requireNoCorruptCol(ddl)
    spark.read
      .schema(ddl + ", _corrupt_record STRING")
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampFormat", timestampFormat)
      .csv(path)
  }

  // fail at the call site, not with a far-away duplicate-column
  // AnalysisException — e.g. when re-reading a reader's own
  // quarantined output to reprocess it. Parsed field-name equality,
  // not a substring scan: a legal column that merely CONTAINS the
  // name (raw_corrupt_record_src) must stay accepted.
  private def requireNoCorruptCol(ddl: String): Unit =
    require(
      !org.apache.spark.sql.types.StructType.fromDDL(ddl)
        .fieldNames.exists(_.equalsIgnoreCase("_corrupt_record")),
      "the caller DDL already declares _corrupt_record — the reader appends its own; " +
        "rename the field or strip it before re-ingesting quarantined output")

  /** Schema-enforced JSON-lines reader — the API-response archive
    * path (the reference lands raw coingecko/dune responses before
    * normalizing). Same contract as [[readCsv]]: explicit DDL schema
    * (no double-scan inference), malformed lines quarantined into
    * `_corrupt_record` rather than failing a TB-scale ingest, and
    * JSONL (one object per line) so the file SPLITS — a single
    * multi-line JSON document is one unsplittable task at any size. */
  def readJsonl(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      ddl: String,
      timestampFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame = {
    requireNoCorruptCol(ddl)
    spark.read
      .schema(ddl + ", _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampFormat", timestampFormat)
      .json(path)
  }

  /** Parse a JSON string column against a DDL schema and lift every
    * top-level field alongside the original columns
    * (coingecko_parse_json's metadata extraction, minus the driver
    * loop — the parse runs inside the scan stage). */
  def parseJson(df: DataFrame, jsonCol: String, ddl: String, drop: Boolean = true): DataFrame = {
    val parsed = df.withColumn("__j", from_json(col(jsonCol), lit(ddl)))
    val lifted = parsed.select((parsed.columns.filterNot(_ == "__j").map(col) :+
      col("__j.*")): _*)
    if (drop) lifted.drop(jsonCol) else lifted
  }

  /** Incremental upsert: keep the newest row per key across the
    * existing table and an update batch (the reference's
    * DELETE+INSERT refresh, e.g. dune_transfers_updates). One
    * union + one window shuffle on the keys; at 100 TB pair it with
    * partition pruning so only touched partitions rewrite. */
  def keepLatest(
      existing: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      versionCols: Seq[Column]): DataFrame =
    WindowOps.dedupeFirst(
      existing.unionByName(updates, allowMissingColumns = true),
      keys,
      versionCols.map(_.desc))

  /** Two-source entity resolution (source-A precedence) — the common
    * case, delegating to the N-source form. */
  def coalesceSources(
      a: DataFrame,
      b: DataFrame,
      keys: Seq[String],
      valueCols: Seq[String]): DataFrame =
    coalesceSources(Seq(a, b), keys, valueCols)

  /** N-source entity resolution: full-outer join the sources on the
    * key in precedence order (earlier sources win), field-wise
    * coalesce, plus an `n_sources` lineage column (core_coins.py
    * coalesces across 3+ left-joined sources — here the join chain is
    * full-outer so a key present in ANY source survives). Each source
    * joins once; `keys` columns are auto-coalesced by the USING join,
    * so the fold is associative in the key space. */
  def coalesceSources(
      sources: Seq[DataFrame],
      keys: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(sources.nonEmpty, "coalesceSources needs at least one source")
    val prepped = sources.zipWithIndex.map { case (s, i) =>
      valueCols.foldLeft(s.withColumn(s"__p$i", lit(1)))(
        (d, c) => d.withColumnRenamed(c, s"__s${i}_$c"))
    }
    val joined = prepped.reduceLeft((acc, s) => acc.join(s, keys, "full_outer"))
    val resolved = valueCols.foldLeft(joined)((d, c) =>
      d.withColumn(c, coalesce(sources.indices.map(i => col(s"__s${i}_$c")): _*)))
    resolved
      .withColumn("n_sources",
        sources.indices.map(i => coalesce(col(s"__p$i"), lit(0))).reduce(_ + _))
      .drop(sources.indices.flatMap(i =>
        valueCols.map(c => s"__s${i}_$c") :+ s"__p$i"): _*)
  }

  /** The reference's dominant operational pattern composed end-to-end:
    * DELETE+INSERT refresh of only-new data
    * (dune_transfers_updates/retrieve_dune_transfer_data.py,
    * coingecko_market_data.py:317-380 filter already-stored dates
    * before upload). Spark-native form: [[keepLatest]] over ONLY the
    * partitions the update batch touches, then a dynamic-partition-
    * overwrite write — untouched partitions are never read OR
    * rewritten, so a daily refresh of a 100 TB table costs
    * O(updated-partition bytes), not O(table bytes).
    *
    * The refreshed rows are staged to a scratch directory first:
    * Spark (correctly) refuses to overwrite a path that appears as a
    * source in the same plan, and at scale the stage-then-swap also
    * bounds the failure domain (a mid-write crash leaves the target's
    * committed partitions intact).
    */
  def incrementalRefresh(
      tablePath: String,
      updates: DataFrame,
      keys: Seq[String],
      versionCols: Seq[Column],
      partitionCols: Seq[String],
      stagingPath: String): Unit = {
    val spark = updates.sparkSession
    // bootstrap: a first-ever batch has no table to refresh — write
    // the deduped batch as the initial partitioned table (the same
    // thing the reference's first DELETE+INSERT run does)
    val tableRoot = new java.io.File(tablePath)
    val hasData = tableRoot.isDirectory &&
      Option(tableRoot.listFiles()).exists(_.exists(f =>
        f.getName.endsWith(".parquet") || f.getName.contains("=")))
    if (!hasData) {
      Sinks.writePartitioned(
        WindowOps.dedupeFirst(updates, keys, versionCols.map(_.desc)),
        tablePath, partitionCols)
      return
    }
    val existing = spark.read.parquet(tablePath)
    // partition pruning, not a full-table read: semi-join on the
    // distinct touched partition values (broadcast — a batch touches
    // few partitions) reaches the scan as a partition filter
    val touched = updates.select(partitionCols.map(col): _*).distinct()
    val existingTouched = existing.join(broadcast(touched), partitionCols, "left_semi")
    val refreshed = keepLatest(existingTouched, updates, keys, versionCols)
    refreshed.write.mode("overwrite").parquet(stagingPath)
    Sinks.writePartitioned(
      spark.read.parquet(stagingPath), tablePath, partitionCols)
  }
}
