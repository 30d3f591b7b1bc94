package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{EventRollup, RunningBalance, Transfer}

/** S1/S2: drive the streaming operators through MemoryStream →
  * writeStream (the real Structured Streaming engine, micro-batched)
  * and assert stream ≡ batch twin on the same sf0.001 data. */
case class Ev(event_id: Long, event_type: String, user_id: Long,
    ts: java.sql.Timestamp, value: Double)

class StreamingSpec extends SparkSpec {

  test("S1: windowed rollup over a stream matches the batch daily rollup") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val rows = Tables.events(spark, SfDir)
      .select("event_id", "event_type", "user_id", "ts", "value")
      .as[Ev].collect()

    val mem = MemoryStream[Ev]
    val query = EventRollup.daily(mem.toDF())
      .writeStream.format("memory").queryName("s1_rollup")
      .outputMode("complete").start()
    try {
      // two micro-batches to exercise incremental state updates
      val (first, second) = rows.splitAt(rows.length / 2)
      mem.addData(first.toIndexedSeq)
      query.processAllAvailable()
      mem.addData(second.toIndexedSeq)
      query.processAllAvailable()

      val streamed = spark.table("s1_rollup")
      val batch = SparkEntry.q15DailyRollup(spark, SfDir)
        .withColumnRenamed("event_type", "event_type")
      assert(streamed.count() == batch.count())
      val joined = streamed.as("s").join(batch.as("b"), Seq("event_type", "date"))
      val bad = joined.where(
        col("s.n_events") =!= col("b.n_events") ||
          abs(col("s.sum_value") - col("b.sum_value")) > 1e-4 ||
          col("s.min_value") =!= col("b.min_value") ||
          col("s.max_value") =!= col("b.max_value"))
      assert(bad.count() == 0, "stream/batch rollup mismatch")
    } finally query.stop()
  }

  test("S2: stateful running balance matches the batch window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val transfers = Tables.transfers(spark, SfDir).as[Transfer].collect()
      .sortBy(t => t.date.getTime)

    val mem = MemoryStream[Transfer]
    val query = RunningBalance(mem.toDS())
      .writeStream.format("memory").queryName("s2_balance")
      .outputMode("append").start()
    try {
      // split by date so the second batch continues carried state
      val cut = transfers(transfers.length / 2).date.getTime
      mem.addData(transfers.filter(_.date.getTime <= cut).toIndexedSeq)
      query.processAllAvailable()
      mem.addData(transfers.filter(_.date.getTime > cut).toIndexedSeq)
      query.processAllAvailable()

      val streamed = spark.table("s2_balance")
      val batch = Tables.transfersWithBalance(spark, SfDir)
      assert(streamed.count() == batch.count())
      val joined = streamed.as("s")
        .join(batch.as("b"), Seq("asset", "wallet", "date"))
      val bad = joined.where(
        abs(col("s.balance") - col("b.balance")) > 1e-4 ||
          col("s.transfer_sequence") =!= col("b.transfer_sequence"))
      assert(bad.count() == 0, "stream/batch balance mismatch")
    } finally query.stop()
  }
}
