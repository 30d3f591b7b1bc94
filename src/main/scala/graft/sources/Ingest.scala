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
      timestampFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame =
    spark.read
      .schema(ddl + ", _corrupt_record STRING")
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampFormat", timestampFormat)
      .csv(path)

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

  /** Two-source entity resolution: full-outer join on the key,
    * field-wise coalesce with source-A precedence, plus lineage
    * columns (core_coins' coalesce-across-sources rebuild). */
  def coalesceSources(
      a: DataFrame,
      b: DataFrame,
      keys: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val aP = valueCols.foldLeft(a.withColumn("__a_present", lit(1)))(
      (d, c) => d.withColumnRenamed(c, s"__a_$c"))
    val bP = valueCols.foldLeft(b.withColumn("__b_present", lit(1)))(
      (d, c) => d.withColumnRenamed(c, s"__b_$c"))
    val joined = aP.join(bP, keys, "full_outer")
    val resolved = valueCols.foldLeft(joined)((d, c) =>
      d.withColumn(c, coalesce(col(s"__a_$c"), col(s"__b_$c"))))
    resolved
      .withColumn("n_sources",
        coalesce(col("__a_present"), lit(0)) + coalesce(col("__b_present"), lit(0)))
      .drop(valueCols.flatMap(c => Seq(s"__a_$c", s"__b_$c")) :+ "__a_present" :+ "__b_present": _*)
  }
}
