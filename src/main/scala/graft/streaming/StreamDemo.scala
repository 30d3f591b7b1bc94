package graft.streaming

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Runnable end-to-end Structured Streaming demo over real files:
  * stages the events parquet into a watched directory, then runs
  * readStream → EventRollup → writeStream (memory sink), with
  * maxFilesPerTrigger forcing multiple micro-batches — the same
  * incremental path a production deployment runs against an
  * arriving-file bucket.
  *
  * Usage: runMain graft.streaming.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(4)

    // stage input as several files so the stream sees >1 micro-batch
    val staging = java.nio.file.Files.createTempDirectory("graft_stream_in").toString
    val events = Tables.events(spark, sfDir)
    events.repartition(4).write.mode("overwrite").parquet(staging)

    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staging)

    val query = EventRollup.daily(stream)
      .writeStream.format("memory").queryName("stream_rollup")
      .outputMode("complete").start()
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("stream_rollup")
    val batch = graft.SparkEntry.q15DailyRollup(spark, sfDir)
    val mismatches = streamed.as("s")
      .join(batch.as("b"), Seq("event_type", "date"), "full_outer")
      .where(
        col("s.n_events").isNull || col("b.n_events").isNull ||
          col("s.n_events") =!= col("b.n_events") ||
          abs(col("s.sum_value") - col("b.sum_value")) > 1e-4)
      .count()
    println(s"""{"stream_rows":${streamed.count()},"batch_rows":${batch.count()},"mismatches":$mismatches}""")
    spark.stop()
    if (mismatches != 0) sys.exit(1)
  }
}
