package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.{Publish, Sinks}
import graft.streaming.DriftStream

/** S44 (streaming/DriftStream): maintained feed-health drift stats.
  * Pins the additive identity (driftView ≡ the one-shot q208 monitor
  * over everything ingested, any batch chop), the retroactive flag
  * flip, fold safety, replay refusal, and kill-and-restart. */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def view(statsRoot: String, refRoot: String) =
    DriftStream.driftView(spark, statsRoot, refRoot, alertPpm = 150000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq

  test("streamed view equals the one-shot q208 monitor; replay refused; fold preserves") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_s44").toString
    val (refRoot, statsRoot) = (s"$base/ref", s"$base/stats")
    val docs = Tables.documents(spark, SfDir)

    // fixed reference = the curated en slice, the q208 refPred
    DriftStream.publishReference(
      docs.where(col("lang") === "en"), "text", buckets = 256, refRoot)
    // idempotent: a second setup publishes nothing
    val rv = Publish.currentVersion(refRoot)
    DriftStream.publishReference(
      docs.where(col("lang") === "en"), "text", buckets = 256, refRoot)
    assert(Publish.currentVersion(refRoot) == rv)
    assert(DriftStream.referenceBuckets(refRoot) == 256)

    // ingest the whole corpus through the REAL micro-batch engine
    val all = docs.select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val mem = MemoryStream[(Long, String, String)]
    val query = DriftStream.start(
      mem.toDF().toDF("doc_id", "text", "source"),
      "text", "source", refRoot, statsRoot)
    try {
      all.grouped(math.max(1, all.length / 3)).foreach { c =>
        mem.addData(c.toIndexedSeq); query.processAllAvailable()
      }
    } finally query.stop()

    // identity: the maintained view IS q208 over everything ingested
    // (same reference slice, same buckets, same arithmetic)
    val want = SparkEntry.q208SourceDrift(spark, SfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(view(statsRoot, refRoot) == want,
      "maintained drift view diverged from the one-shot monitor")

    // replay: refused untouched
    val lastId = DriftStream.lastBatch(statsRoot).get
    val v = Publish.currentVersion(statsRoot)
    assert(!DriftStream.applyBatch(
      Seq((1L, "alpha", "srcX")).toDF("doc_id", "text", "source"),
      lastId, "text", "source", refRoot, statsRoot))
    assert(Publish.currentVersion(statsRoot) == v)

    // fold: one row per (source, bucket), view identical, replay
    // still refused (the folded version carries the batch marker)
    DriftStream.foldProfile(spark, statsRoot): Unit
    val folded = Publish.read(spark, statsRoot)
    assert(folded.groupBy("source", "bucket").count().where(col("count") > 1).isEmpty)
    assert(view(statsRoot, refRoot) == want, "fold changed the drift view")
    assert(!DriftStream.applyBatch(
      Seq((1L, "alpha", "srcX")).toDF("doc_id", "text", "source"),
      lastId, "text", "source", refRoot, statsRoot),
      "fold must carry the replay marker (the S20 lesson)")
    Sinks.deleteRecursively(java.nio.file.Paths.get(base))
  }

  test("a feed that rots in a LATER batch flips retroactively, exactly as one-shot") {
    val base = Files.createTempDirectory("graft_s44_rot").toString
    val (refRoot, statsRoot) = (s"$base/ref", s"$base/stats")
    val ref = Seq((1L, "alpha beta alpha gamma", "base"),
      (2L, "beta gamma alpha alpha", "base")).toDF("doc_id", "text", "source")
    DriftStream.publishReference(ref, "text", buckets = 256, refRoot)

    // batch 0: 'feed' emits exactly the reference mix — healthy
    val clean = Seq((10L, "alpha beta alpha gamma", "feed"),
      (11L, "beta gamma alpha alpha", "feed")).toDF("doc_id", "text", "source")
    assert(DriftStream.applyBatch(clean, 0L, "text", "source", refRoot, statsRoot))
    val healthy = view(statsRoot, refRoot)
    assert(healthy == Seq(("feed", 14L, 0L, 0)), s"clean feed must read 0 ppm: $healthy")

    // batch 1: the same feed starts emitting alien content — the flag
    // flips over the feed's WHOLE history (drift is a mix property)
    val rotten = Seq((12L, "zulu quux zulu quux", "feed"),
      (13L, "quux zulu quux quux", "feed")).toDF("doc_id", "text", "source")
    assert(DriftStream.applyBatch(rotten, 1L, "text", "source", refRoot, statsRoot))
    val after = view(statsRoot, refRoot)
    assert(after.head._4 == 1, s"rotted feed must flag: $after")
    // exact one-shot equivalence on the union (any chop, same verdict)
    val oneShot = graft.text.Drift.tvFromProfiles(
      graft.text.Drift.gramProfile(clean.unionByName(rotten), "text", "source", 256),
      Publish.read(spark, refRoot).select("bucket", "n"), 150000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(after == oneShot, "batched view diverged from the one-shot union")
    Sinks.deleteRecursively(java.nio.file.Paths.get(base))
  }

  test("S44r: the drift view survives a mid-backlog kill-and-restart") {
    val base = Files.createTempDirectory("graft_s44_r").toString
    val (refRoot, statsRoot) = (s"$base/ref", s"$base/stats")
    val docs = Tables.documents(spark, SfDir)
    DriftStream.publishReference(
      docs.where(col("lang") === "en"), "text", buckets = 256, refRoot)
    val all = docs.select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val parts = all.grouped(math.max(1, all.length / 4)).toSeq
      .map(_.toSeq.toDF("doc_id", "text", "source"))
    graft.streaming.DurableReplay.runForeachRestart(spark,
      parts.take(2), parts.drop(2),
      (stream, ckpt) => DriftStream.start(stream, "text", "source",
        refRoot, statsRoot, checkpointLocation = Some(ckpt)),
      () => DriftStream.lastBatch(statsRoot))
    val want = SparkEntry.q208SourceDrift(spark, SfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(view(statsRoot, refRoot) == want,
      "drift view diverged after kill-and-restart")
    Sinks.deleteRecursively(java.nio.file.Paths.get(base))
  }
}
