package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** Sink layout behaviors that matter at scale: partition pruning on
  * partitioned writes, shuffle-free joins on bucketed writes. */
class SinksSpec extends SparkSpec {

  test("partitioned write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft_part").toString
    val ev = Tables.events(spark, SfDir)
    Sinks.writePartitioned(ev, dir, Seq("event_type"))

    val back = spark.read.parquet(dir).where(col("event_type") === "click")
    assert(back.count() == ev.where(col("event_type") === "click").count())
    // pruning proof: the scan's partition filters catch the predicate
    val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("event_type"),
      s"expected partition filters in scan:\n$scan")
  }

  test("bucketed tables join without a shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = Tables.transfers(spark, SfDir)
      Sinks.writeBucketed(t.where(col("wallet") % 2 === 0), "graft_bucket_a",
        bucketCols = Seq("wallet"), numBuckets = 8, sortCols = Seq("wallet"))
      Sinks.writeBucketed(t.where(col("wallet") % 2 === 1).select(col("wallet"), col("net_transfers")),
        "graft_bucket_b", bucketCols = Seq("wallet"), numBuckets = 8, sortCols = Seq("wallet"))

      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), Seq("wallet"))
      joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("profits window chain over the bucketed transfers table runs with zero Exchange") {
    import org.apache.spark.sql.expressions.Window
    try {
      // the q44 layout: fact table bucketed on the window partition key
      Sinks.writeBucketed(
        Tables.transfersWithBalance(spark, SfDir).drop("transfer_sequence"),
        "graft_twb_spec", bucketCols = Seq("asset", "wallet"), numBuckets = 8,
        sortCols = Seq("asset", "wallet", "date"))
      val w = Window.partitionBy("asset", "wallet").orderBy("date")
      // the flagship's per-wallet window chain (running inflows +
      // sequence) — on the shuffled layout this is the ONE fact
      // exchange q10 pays; on the bucketed layout it must vanish
      val chained = spark.table("graft_twb_spec")
        .withColumn("inflows_cum", sum(greatest(col("net_transfers"), lit(0.0))).over(w))
        .withColumn("seq", count(lit(1)).over(w))
      chained.count()
      val plan = chained.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed window chain should not shuffle:\n$plan")
    } finally {
      Sinks.dropTable(spark, "graft_twb_spec")
    }
  }
}
