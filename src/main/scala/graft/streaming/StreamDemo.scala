package graft.streaming

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Runnable end-to-end DURABLE Structured Streaming demo over real
  * files: stages the events parquet into a watched directory as
  * time-ordered file batches, runs readStream → EventRollup →
  * parquet sink with a checkpoint, STOPS the query mid-backlog, then
  * restarts it from the checkpoint and proves the recovered output is
  * exactly-once (no lost windows, no duplicated windows) against the
  * batch twin — the restartable-by-construction property the
  * reference's idempotent-upsert pipelines have
  * (dune_transfers_updates' DELETE+INSERT refresh).
  *
  * Usage: runMain graft.streaming.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(4)
    import spark.implicits._

    val events = Tables.events(spark, sfDir)
      .select("event_id", "event_type", "user_id", "ts", "value")

    // stage input as 4 TIME-ORDERED files (increasing mtimes): the
    // file source replays oldest-first, so the watermark always trails
    // the data still to come and nothing is dropped as late
    val inDir = java.nio.file.Files.createTempDirectory("graft_stream_in").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString + "/out"
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    val w = org.apache.spark.sql.expressions.Window.orderBy("ts")
    val quartiled = events.withColumn("__q", ntile(4).over(w)).cache()
    (1 to 4).foreach { i =>
      quartiled.where(col("__q") === i).drop("__q")
        .coalesce(1).write.mode("append").parquet(inDir)
      Thread.sleep(50)
    }

    def mkQuery() = {
      val stream = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      EventRollup.daily(stream)
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckptDir)
        .outputMode("append").start()
    }

    // first incarnation: process part of the backlog, then stop —
    // offsets and window state survive in the checkpoint
    val q1 = mkQuery()
    val deadline = System.currentTimeMillis + 120000
    while (q1.recentProgress.length < 2 && System.currentTimeMillis < deadline)
      Thread.sleep(50)
    val batchesBeforeStop = q1.recentProgress.length
    q1.stop()

    // second incarnation: resume from the checkpoint, drain the rest,
    // then push the watermark past every real window with a far-future
    // sentinel so append mode flushes them
    val q2 = mkQuery()
    q2.processAllAvailable()
    val maxTs = events.agg(max("ts")).head.getTimestamp(0)
    Seq((9999999L, "zz_sentinel", 0L,
        new java.sql.Timestamp(maxTs.getTime + 10L * 24 * 3600 * 1000), 0.0))
      .toDF("event_id", "event_type", "user_id", "ts", "value")
      .write.mode("append").parquet(inDir)
    q2.processAllAvailable()

    val batch = graft.SparkEntry.q15DailyRollup(spark, sfDir).cache()
    val expect = batch.count()
    def sunk() = spark.read.parquet(sinkDir).where(col("event_type") =!= "zz_sentinel")
    // the closing emission may ride the no-data batch after the sentinel
    val flushDeadline = System.currentTimeMillis + 60000
    while (sunk().count() < expect && System.currentTimeMillis < flushDeadline)
      Thread.sleep(200)
    q2.stop()

    val out = sunk().cache()
    val dupes = out.groupBy("event_type", "date").count().where(col("count") > 1).count()
    val mismatches = out.as("s")
      .join(batch.as("b"), Seq("event_type", "date"), "full_outer")
      .where(
        col("s.n_events").isNull || col("b.n_events").isNull ||
          col("s.n_events") =!= col("b.n_events") ||
          abs(col("s.sum_value") - col("b.sum_value")) > 1e-4)
      .count()
    println(s"""{"stream_rows":${out.count()},"batch_rows":$expect,""" +
      s""""batches_before_stop":$batchesBeforeStop,"dupes":$dupes,"mismatches":$mismatches}""")
    spark.stop()
    if (mismatches != 0 || dupes != 0) sys.exit(1)
  }
}
