package graft.streaming

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Runnable end-to-end DURABLE Structured Streaming demo over real
  * files: [[DurableReplay]] stages the events parquet into a watched
  * directory, runs readStream → EventRollup → parquet sink with a
  * checkpoint, STOPS the query mid-backlog, restarts it, and this
  * main proves the recovered output is exactly-once (no lost windows,
  * no duplicated windows) against the batch twin — the
  * restartable-by-construction property the reference's
  * idempotent-upsert pipelines have (dune_transfers_updates'
  * DELETE+INSERT refresh).
  *
  * Usage: runMain graft.streaming.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(4)

    val events = Tables.events(spark, sfDir)
      .select("event_id", "event_type", "user_id", "ts", "value")
    val batch = graft.SparkEntry.q15DailyRollup(spark, sfDir).cache()
    val expect = batch.count()

    val (out0, batchesBeforeStop) = DurableReplay.run(spark, events, expect)
    val out = out0.cache()
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
