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

  test("the data path range-partitions; only partition TOTALS hit a single task") {
    val plan = PrefixSum.globalRunningSum(fixture, Seq("v", "id"), "v", "run")
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"expected a range exchange on the data path:\n$plan")
    // the one SinglePartition exchange must sit above the per-partition
    // aggregate (<= numPartitions rows), never above the raw data: in
    // this plan a data-path funnel would appear as SinglePartition
    // directly over the range sort with no intervening aggregate
    val single = plan.linesIterator.count(_.contains("SinglePartition"))
    assert(single <= 1, s"more than one single-partition exchange:\n$plan")
    assert(plan.contains("__psum") || single == 0,
      s"the single-partition exchange is not the partition-totals scan:\n$plan")
  }

  test("double-typed measures keep their type through the offset coalesce") {
    val df = Seq((1L, 0.5), (2L, 1.25), (3L, 2.0)).toDF("id", "v")
    val got = PrefixSum.globalRunningSum(df, Seq("id"), "v", "run")
      .orderBy("id").select("run").as[Double].collect().toSeq
    assert(got == Seq(0.5, 1.75, 3.75))
  }
}
