package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Scd
import graft.sources.{Deletes, Publish}

/** S26: a STRUCTURED-STREAMING SOURCE over the Publish version layout
  * — every published table becomes a CDC stream, the consumer twin of
  * the producer family (S15/S18/S20/S24/S25 write versions; this
  * reads them back as a change feed):
  *
  * {{{
  *   spark.readStream
  *     .format("graft.streaming.ChangeFeedSourceProvider")
  *     .option("root", "/data/lake/events")
  *     .option("keys", "id").option("values", "v")
  *     .load()
  * }}}
  *
  * The offset MODEL is the design: a streaming offset IS a Publish
  * version number. `getOffset` reads the live pointer (one file);
  * batch (start, end] is the initial snapshot surfaced as inserts
  * (start 0 → version 1, `from_version` 0) followed by
  * [[Scd.changeFeedBetween]]'s per-step insert/update/delete
  * classification with version lineage — DV versions read through
  * their sidecars, so a deletion-vector commit streams as the
  * deletes it semantically is. Offsets ride the engine's checkpoint
  * exactly like any source's, so a restarted query resumes at the
  * first unconsumed VERSION — exactly-once delivery of every commit,
  * from the immutable snapshot layout alone, no log subscription.
  *
  * Retention is the horizon contract (the q138/q134 argument): a
  * consumer must not lag past [[Publish.expireVersions]]' keepWithin
  * window, and a version reaped mid-lag fails the batch LOUDLY
  * (changeFeedBetween's refusal), never silently skips commits.
  *
  * At 100 TB each tick costs one full-outer key join per consumed
  * version step over the two snapshots — the feed re-derivation
  * trade the snapshot layout makes; producers that need cheaper
  * ticks keep a delta log (the S24 merge manifests) and consumers
  * that need cheaper reads consume less often.
  */
class ChangeFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), ChangeFeedSource.feedSchema(
      sqlContext.sparkSession, parameters))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new ChangeFeedSource(sqlContext.sparkSession, parameters)
}

object ChangeFeedSource {

  /** `readStream.table` sugar for the feed: subscribe to a
    * GraftCatalog table's change stream by NAME, resolving the root
    * and the feed's key/value columns from the same catalog
    * configuration the `t$changes` SQL relation reads
    * (`spark.sql.catalog.<cat>.changes.<table>.keys` / `.values`,
    * values defaulting to the live manifest schema minus keys) — so
    * the streamed feed and `FROM cat.`t$changes`` are configured
    * once and guaranteed to describe the same columns. The stream
    * still rides the V1 Source (the architecture decision pinned in
    * ChangeFeedSourceSpec: each step is a distributed full-outer
    * diff join, which a DSv2 MicroBatchStream's independent
    * per-partition readers cannot express — the same reason Delta's
    * streaming source is a V1 `Source`).
    *
    * Accepts `cat.table` or `cat.ns….table` (publish-mode catalogs —
    * the layout S26 consumes; a snapshot-mode catalog's pinned
    * multi-table flips stream through S23's machinery instead). */
  def tableChanges(spark: SparkSession, qualifiedName: String): DataFrame = {
    val parts = qualifiedName.split('.')
    require(parts.length >= 2,
      s"expected cat.[ns.]table, got '$qualifiedName'")
    val (cat, tname) = (parts.head, parts.last)
    def conf(suffix: String): Option[String] =
      spark.conf.getOption(s"spark.sql.catalog.$cat$suffix")
    val catRoot = conf(".root").getOrElse(throw new IllegalArgumentException(
      s"catalog '$cat' is not configured — set spark.sql.catalog.$cat.root"))
    require(!conf(".mode").contains("snapshot"),
      s"catalog '$cat' is snapshot-mode — its tables advance by catalog " +
        "flips; stream those through CatalogStream (S23)")
    val root = java.nio.file.Paths.get(catRoot, parts.tail: _*).toString
    val keys = conf(s".changes.$tname.keys").getOrElse(
      throw new IllegalArgumentException(
        s"`$tname` has no feed keys — set spark.sql.catalog.$cat.changes.$tname.keys"))
    val values = conf(s".changes.$tname.values").getOrElse {
      val live = Publish.currentVersion(root).getOrElse(
        throw new IllegalStateException(
          s"nothing published at $root — publish before subscribing"))
      val keySet = keys.split(',').map(_.trim).toSet
      val base = StructType.fromDDL(Publish.manifestSchemaDdl(root, live).get)
      base.fieldNames.filterNot(keySet.contains).mkString(",")
    }
    spark.readStream
      .format(classOf[ChangeFeedSourceProvider].getName)
      .option("root", root).option("keys", keys).option("values", values)
      .load()
  }

  private[streaming] def params(p: Map[String, String]): (String, Seq[String], Seq[String]) = {
    val root = p.getOrElse("root",
      throw new IllegalArgumentException("graft-cdc needs option 'root'"))
    val keys = p.getOrElse("keys",
      throw new IllegalArgumentException("graft-cdc needs option 'keys'"))
      .split(",").map(_.trim).toSeq
    val values = p.getOrElse("values",
      throw new IllegalArgumentException("graft-cdc needs option 'values'"))
      .split(",").map(_.trim).toSeq
    (root, keys, values)
  }

  /** The feed's schema, derived from the LIVE manifest's: key columns
    * as published, change_type, old_/new_ per value column, version
    * lineage. */
  private[streaming] def feedSchema(
      spark: SparkSession, p: Map[String, String]): StructType = {
    val (root, keys, values) = params(p)
    val live = Publish.currentVersion(root).getOrElse(
      throw new IllegalStateException(
        s"graft-cdc: nothing published at $root — publish before subscribing"))
    val base = StructType.fromDDL(Publish.manifestSchemaDdl(root, live).get)
    StructType(
      keys.map(k => base(k)) ++
        Seq(StructField("change_type", StringType, nullable = false)) ++
        values.flatMap { v =>
          val t = base(v).dataType
          Seq(StructField(s"old_$v", t), StructField(s"new_$v", t))
        } ++
        Seq(StructField("from_version", LongType, nullable = false),
          StructField("to_version", LongType, nullable = false)))
  }
}

class ChangeFeedSource(
    spark: SparkSession,
    parameters: Map[String, String]) extends Source {

  private val (root, keys, values) = ChangeFeedSource.params(parameters)

  override val schema: StructType =
    ChangeFeedSource.feedSchema(spark, parameters)

  override def getOffset: Option[V1Offset] =
    Publish.currentVersion(root).map(LongOffset(_))

  private def ver(o: V1Offset): Long = o.json().toLong

  /** The bootstrap snapshot surfaced as the feed's opening inserts
    * (from_version = bootVersion−1): a subscriber that starts from
    * nothing first receives one whole retained snapshot, then deltas
    * — Delta CDF's startingVersion semantics. The bootstrap version
    * is the OLDEST RETAINED one, not a hardcoded v=1: on any table
    * whose early versions were vacuumed/expired (the append sink
    * defaults to keep=1), v=1 is gone and a new subscriber must
    * start from the retention horizon — the same horizon contract as
    * mid-stream lag (versions reaped inside a pending range still
    * refuse loudly). */
  private def initialInserts(bootVersion: Long): DataFrame = {
    val snap = Deletes.read(spark,
      java.nio.file.Paths.get(root).resolve(s"v=$bootVersion").toString)
    val cols =
      keys.map(col) ++
        Seq(lit("insert").as("change_type")) ++
        values.flatMap { v =>
          Seq(lit(null).cast(snap.schema(v).dataType).as(s"old_$v"),
            col(v).as(s"new_$v"))
        } ++
        Seq(lit(bootVersion - 1L).as("from_version"),
          lit(bootVersion).as("to_version"))
    snap.select(cols: _*)
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(ver).getOrElse(0L)
    val to = ver(end)
    // a fresh subscriber boots from the oldest version still on disk
    // (≤ the batch's end — a racing writer may have committed newer)
    val (snapshotStep, deltaFrom) =
      if (from == 0L && to >= 1L) {
        val boot = Publish.listVersions(java.nio.file.Paths.get(root))
          .filter(_ <= to).minOption.getOrElse(
            throw new IllegalStateException(
              s"graft-cdc: no retained version ≤ $to at $root — expired past retention?"))
        (Some(initialInserts(boot)), boot)
      } else (None, math.max(from, 1L))
    val deltaSteps =
      if (deltaFrom < to)
        Some(Scd.changeFeedBetween(spark, root, deltaFrom, to, keys, values))
      else None
    val batch = (snapshotStep.toSeq ++ deltaSteps.toSeq)
      .reduceOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema))
    // the engine asserts isStreaming on getBatch's result — the V1
    // source contract FileStreamSource satisfies the same way
    org.apache.spark.sql.graftglue.GraftBridge.asStreamingBatch(batch)
  }

  override def stop(): Unit = ()
}
