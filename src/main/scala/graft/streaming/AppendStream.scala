package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.{Compact, Publish}

/** S20: append-only versioned ingest with the full table-service loop
  * — the streaming composition of the r8 storage-maintenance family.
  *
  * [[PublishStream]] (S15) and [[AggTableSink]] (S18) REWRITE their
  * whole snapshot every micro-batch — right for bounded serving
  * tables, wrong for an append-only fact table where each batch is a
  * sliver of the total. This sink makes append O(batch), the way a
  * real table format commits: a new version CARRIES the live
  * version's data files as hard links (zero bytes moved, byte
  * identity by construction — the local-FS stand-in for a manifest
  * re-referencing the same objects) and writes ONLY the batch's rows
  * as new files. Readers still resolve one atomic, footer-validated
  * snapshot per version.
  *
  * Appending one file-set per batch is exactly how small-file
  * fragmentation accretes, so the MAINTENANCE loop rides the same
  * cadence: every `compactEvery` batches the sink runs
  * [[Compact.compactPublishedIncremental]] (well-sized files carried
  * byte-identically, fragments re-binned) and then vacuums versions
  * past the retention window. Compaction passes the sink's batch-id
  * marker through `extraMeta` — a maintenance version must never
  * reset replay refusal.
  *
  * Exactly-once is S18's commit-level argument: append is not
  * idempotent, so the micro-batch id rides the manifest inside the
  * atomic pointer flip and a replayed batch is refused BEFORE any
  * link or write. A crash mid-stage leaves the old version live
  * (garbage staging reaped by the next publish); a crash after the
  * flip makes the replay a no-op.
  */
object AppendStream {

  private val BatchKey = "graft.batchId"

  /** The last micro-batch id committed at `root`, if any. */
  def lastBatch(root: String): Option[Long] =
    Publish.currentMetaValue(root, BatchKey).map(_.toLong)

  /** Append one micro-batch as a new version (hard-linked carry +
    * batch files), then run the maintenance loop on cadence. Returns
    * false (no writes at all) for an already-committed batch id.
    *
    * @param extraMeta caller key/values recorded alongside the
    *   batch-id marker in the append version's manifest — the
    *   provenance channel (e.g. which model version scored the
    *   batch). The batch-id key itself is reserved and always wins.
    * @param statsCols when non-empty, the compaction cadence also
    *   refreshes the new version's [[graft.sources.FileStats]]
    *   `_fstats` manifest INCREMENTALLY (carried files re-point their
    *   stat rows, only re-binned fragments are scanned — the q110
    *   cost model riding the stream's own cadence), so selective
    *   readers keep file-skipping against a table that never stops
    *   ingesting. Between compactions the manifest lags the newest
    *   appends — skipping is an optimization, and a reader that wants
    *   the manifest's horizon pins the version it describes. */
  def applyBatch(
      batch: DataFrame,
      batchId: Long,
      root: String,
      compactEvery: Int = 0,
      targetBytes: Long = 128L * 1024 * 1024,
      retain: Int = 1,
      statsCols: Seq[String] = Nil,
      statsKeyCols: Seq[String] = Nil,
      extraMeta: Map[String, String] = Map.empty): Boolean = {
    if (lastBatch(root).exists(_ >= batchId)) false
    else {
      val spark = batch.sparkSession
      // CAS + rebase (graft.sources.Txn): the carry list is derived
      // from the live version, so a maintenance job (or any other
      // writer) committing between derivation and flip must force a
      // re-derivation against ITS result — never lose the batch, and
      // never resurrect the pre-maintenance file set
      graft.sources.Txn.retry(root) { live =>
        // mergeSchema: a batch can legitimately differ in width from
        // the carried files (a post-evolution table, or a feed that
        // grew a column) — the new manifest must record the union,
        // never a sampled footer's width
        Publish.publishStagedIf(spark, root, expectedLive = live,
          meta = extraMeta ++ Map(BatchKey -> batchId.toString),
          mergeSchema = true) { staging =>
          Files.createDirectories(Paths.get(staging)): Unit
          live.foreach { v =>
            val vDir = Paths.get(root).resolve(s"v=$v")
            val names = Compact.listDataFiles(vDir.toString).map(_._1)
            names.foreach { name =>
              Files.createLink(Paths.get(staging).resolve(name), vDir.resolve(name)): Unit
            }
            // linked bytes keep their deletion-vector slice
            graft.sources.Deletes.carrySidecarSlice(
              batch.sparkSession, vDir.toString, staging, names)
          }
          batch.write.mode("append").parquet(staging)
        }
      }: Unit
      if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
        Compact.compactPublishedIncremental(spark, root, targetBytes,
          extraMeta = Map(BatchKey -> batchId.toString)): Unit
        if (statsCols.nonEmpty || statsKeyCols.nonEmpty) {
          val newLive = Publish.currentVersion(root).get
          val newDir = Paths.get(root).resolve(s"v=$newLive").toString
          // the prior MANIFEST lives at the last cadence's version
          // (intermediate append versions carry no `_fstats`) — the
          // newest older version that has one is the carry source;
          // stat rows re-point by NAME, valid because both the
          // hard-link append carry and the compaction carry keep the
          // file's bytes (and name) identical
          val priorDir = Publish.listVersions(Paths.get(root))
            .filter(_ < newLive).sorted(Ordering[Long].reverse)
            .map(v => Paths.get(root).resolve(s"v=$v").toString)
            .find(d => Files.exists(
              Paths.get(graft.sources.FileStats.statsPath(d))))
          graft.sources.FileStats.buildIncremental(spark, newDir,
            cols = statsCols, keyCols = statsKeyCols,
            priorFrom = priorDir): Unit
        }
        // vacuum AFTER the stats refresh: buildIncremental re-points
        // carried rows from the prior version's manifest, which must
        // still exist when it reads it
        Publish.vacuum(root, keep = retain): Unit
      }
      true
    }
  }

  /** Start appending a fact stream at `root` with the maintenance
    * loop on `compactEvery` cadence. checkpointLocation required for
    * real restartability (the [[UpsertSink.start]] argument). */
  def start(
      facts: DataFrame,
      root: String,
      compactEvery: Int,
      targetBytes: Long,
      retain: Int = 1,
      checkpointLocation: Option[String] = None,
      statsCols: Seq[String] = Nil,
      statsKeyCols: Seq[String] = Nil): StreamingQuery = {
    val writer = facts.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, root, compactEvery, targetBytes, retain,
          statsCols, statsKeyCols): Unit
      }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _)).start()
  }
}
