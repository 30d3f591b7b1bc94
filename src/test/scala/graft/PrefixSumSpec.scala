package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.PrefixSum

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = (0L until 500L)
    .map(i => (i, (i * 7919L % 401L) + 1L)) // non-uniform positive weights
    .toDF("id", "v")

  test("equals the single-task global window on every row") {
    val got = PrefixSum.globalRunningSum(fixture, Seq("v", "id"), "v", "run")
    val naive = fixture.withColumn("run",
      sum("v").over(Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.count() == 500)
    assert(got.exceptAll(naive).count() == 0 && naive.exceptAll(got).count() == 0,
      "distributed prefix sum diverges from the global window")
  }

  test("partition count is a physical knob, not a semantic one") {
    val expected = PrefixSum.globalRunningSum(fixture, Seq("v", "id"), "v", "run", 1)
      .orderBy("id").select("run").as[Long].collect().toSeq
    for (n <- Seq(2, 7, 32)) {
      val got = PrefixSum.globalRunningSum(fixture, Seq("v", "id"), "v", "run", n)
        .orderBy("id").select("run").as[Long].collect().toSeq
      assert(got == expected, s"numPartitions=$n changed the result")
    }
  }

  test("exactly one exchange: the range repartition (no second hash shuffle, no funnel)") {
    // the upstream (pre-pass) plan must be range-partitioned...
    val upstream = fixture.repartitionByRange(32,
        org.apache.spark.sql.functions.col("v"), org.apache.spark.sql.functions.col("id"))
      .sortWithinPartitions("v", "id")
      .queryExecution.executedPlan.toString
    assert(upstream.toLowerCase.contains("rangepartitioning"),
      s"expected a range exchange on the data path:\n$upstream")
    assert(!upstream.contains("SinglePartition") &&
      !upstream.toLowerCase.contains("hashpartitioning"),
      s"data path must shuffle exactly once, by range:\n$upstream")
    // ...and the operator's OUTPUT plan adds no further exchange at
    // all: the per-partition folds run on the shared shuffle output
    // (the old Window-PARTITION-BY-spark_partition_id form inserted a
    // second full-table hash exchange here)
    val out = PrefixSum.globalRunningSum(fixture, Seq("v", "id"), "v", "run")
      .queryExecution.executedPlan.toString
    assert(!out.contains("Exchange"),
      s"prefix-sum output must add no exchange beyond the range shuffle:\n$out")
  }

  test("double-typed measures keep their type through the offset coalesce") {
    val df = Seq((1L, 0.5), (2L, 1.25), (3L, 2.0)).toDF("id", "v")
    val got = PrefixSum.globalRunningSum(df, Seq("id"), "v", "run")
      .orderBy("id").select("run").as[Double].collect().toSeq
    assert(got == Seq(0.5, 1.75, 3.75))
  }
}
