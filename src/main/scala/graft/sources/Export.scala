package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data EXPORT: size-capped JSONL shards plus a file
  * manifest — the hand-off format training loaders consume (one JSON
  * document per line, one directory per shard, an index of the files
  * inside). The reference ships curated rows out of the warehouse as
  * newline-delimited JSON too (its cloud functions stage
  * dataframe→JSONL uploads); here the export is a first-class sink
  * over any shard-assigned DataFrame (q59's deterministic assignment
  * being the canonical producer).
  *
  * Spark-side this is deliberately a PLAIN partitioned json write:
  *   - `partitionBy(shard)` routes rows to `shard=N/` directories
  *     without a shuffle (each task writes into every shard dir it
  *     sees — dynamic partition writers), so export cost is one scan;
  *   - `maxRecordsPerFile` enforces the size cap WITHOUT a per-shard
  *     repartition: a task splits its output stream when the cap
  *     trips, so a skewed shard becomes MORE files, never a bigger
  *     task — the knob that keeps 100 TB exports OOM-free;
  *   - the JSONL line itself is Spark's codegen'd JSON projection
  *     (schema-ordered fields, full escaping) — lossless for
  *     string/integral columns, which is what [[readJsonlShards]]'s
  *     pinned schema re-reads (NEVER infer at scale: inference is a
  *     second full scan).
  *
  * The manifest is driver-side directory listing — |files| rows,
  * bounded by rows/maxRecordsPerFile, the same driver-bounded-
  * manifest posture as [[FileStats]]. */
object Export {

  /** Write `df` as JSONL shard directories under `outDir`
    * (`shard=<v>/part-*.json`), at most `maxRecordsPerFile` documents
    * per file. */
  def writeJsonlShards(
      df: DataFrame,
      shardCol: String,
      outDir: String,
      maxRecordsPerFile: Long = 100000L): Unit =
    df.write
      .partitionBy(shardCol)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .mode("overwrite")
      .json(outDir)

  /** Read an exported corpus back under a PINNED schema (DDL without
    * the shard column — that comes back from the directory names). */
  def readJsonlShards(
      spark: SparkSession,
      outDir: String,
      schemaDdl: String,
      shardCol: String = "shard"): DataFrame =
    spark.read
      .schema(s"$schemaDdl, $shardCol LONG")
      .json(outDir)

  /** Split-aware shard tree: `split=train/shard=N/part-*.json` — the
    * on-disk hand-off a trainer consumes directly (point the loader
    * at `split=train/`, eval never reads past its own directory).
    * Same mechanics as [[writeJsonlShards]] with the split label as
    * the leading partition dir; [[graft.operators.Splits]] is the
    * canonical label producer, so the wall between the directories is
    * the leakage-free GROUP wall, not a row sample. */
  def writeSplitShards(
      df: DataFrame,
      splitCol: String,
      shardCol: String,
      outDir: String,
      maxRecordsPerFile: Long = 100000L): Unit =
    df.write
      .partitionBy(splitCol, shardCol)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .mode("overwrite")
      .json(outDir)

  /** Read a split tree back under a PINNED schema; both partition
    * columns come back from the directory names. */
  def readSplitShards(
      spark: SparkSession,
      outDir: String,
      schemaDdl: String,
      splitCol: String = "split",
      shardCol: String = "shard"): DataFrame =
    spark.read
      .schema(s"$schemaDdl, $splitCol STRING, $shardCol LONG")
      .json(outDir)

  /** File index of a split tree: (split, shard, file, bytes). */
  def splitManifest(
      spark: SparkSession,
      outDir: String,
      splitCol: String = "split",
      shardCol: String = "shard"): DataFrame = {
    val base = Paths.get(outDir)
    def subdirs(dir: Path, prefix: String): Seq[Path] = {
      val s = Files.list(dir)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(prefix))
        .toSeq
      finally s.close()
    }
    def dataFiles(dir: Path): Seq[Path] = {
      val s = Files.list(dir)
      try s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".json") && !n.startsWith(".") && !n.startsWith("_")
      }.toSeq
      finally s.close()
    }
    val rows = for {
      sd <- subdirs(base, s"$splitCol=")
      split = sd.getFileName.toString.stripPrefix(s"$splitCol=")
      hd <- subdirs(sd, s"$shardCol=")
      shard = hd.getFileName.toString.stripPrefix(s"$shardCol=").toLong
      f <- dataFiles(hd)
    } yield (split, shard, f.getFileName.toString, Files.size(f))
    import spark.implicits._
    rows.toDF(splitCol, shardCol, "file", "bytes")
  }

  /** The export's file index: one row per data file —
    * (shard, file, bytes). Driver-side listing, |files| rows. */
  def manifest(spark: SparkSession, outDir: String, shardCol: String = "shard"): DataFrame = {
    val base = Paths.get(outDir)
    def dataFiles(dir: Path): Seq[Path] = {
      val s = Files.list(dir)
      try s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".json") && !n.startsWith(".") && !n.startsWith("_")
      }.toSeq
      finally s.close()
    }
    val shardDirs = {
      val s = Files.list(base)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(s"$shardCol="))
        .toSeq
      finally s.close()
    }
    val rows = for {
      d <- shardDirs
      shard = d.getFileName.toString.stripPrefix(s"$shardCol=").toLong
      f <- dataFiles(d)
    } yield (shard, f.getFileName.toString, Files.size(f))
    import spark.implicits._
    rows.toDF(shardCol, "file", "bytes")
  }
}
