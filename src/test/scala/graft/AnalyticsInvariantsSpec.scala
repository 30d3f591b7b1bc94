package graft

import org.apache.spark.sql.functions._

/** Invariants for the q33-q40 analytics block. */
class AnalyticsInvariantsSpec extends SparkSpec {

  test("q34: sessions within a user are disjoint and gap-separated") {
    val s = SparkEntry.q34Sessionize(spark, SfDir).cache()
    assert(s.where(col("session_end") < col("session_start")).count() == 0)
    // consecutive sessions of one user must be > 30 minutes apart
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_id")
    val overlapping = s
      .withColumn("__prev_end", lag("session_end", 1).over(w))
      .where(col("__prev_end").isNotNull &&
        unix_micros(col("session_start")) - unix_micros(col("__prev_end")) <= 30L * 60 * 1000000)
      .count()
    assert(overlapping == 0, "sessions closer than the gap were not merged")
    s.unpersist()
  }

  test("q36: window stats bound the price and n7 caps at 7") {
    val df = SparkEntry.q36MovingAvg(spark, SfDir)
    assert(df.where(col("n7") < 1 || col("n7") > 7).count() == 0)
    assert(df.where(col("ma7") < col("min7") || col("ma7") > col("max7")).count() == 0)
    assert(df.where(col("price") < col("min7") || col("price") > col("max7")).count() == 0)
  }

  test("q37: correlations are within [-1, 1] and pairs ordered") {
    val df = SparkEntry.q37PriceCorrelation(spark, SfDir)
    assert(df.where(abs(col("price_corr")) > 1.000001).count() == 0)
    assert(df.where(col("asset_a") >= col("asset_b")).count() == 0)
  }

  test("q38: retained users never exceed the cohort size") {
    val df = SparkEntry.q38Retention(spark, SfDir)
    assert(df.where(col("d1_retained") > col("n_users") ||
      col("d7_retained") > col("n_users")).count() == 0)
    val totalUsers = Tables.events(spark, SfDir).select("user_id").distinct().count()
    assert(df.agg(sum("n_users")).head.getLong(0) == totalUsers,
      "cohorts must partition the user base")
  }

  test("q39: funnel stages are monotonically non-increasing") {
    val r = SparkEntry.q39Funnel(spark, SfDir).head
    val (s1, s2, s3) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(s1 >= s2 && s2 >= s3, s"funnel grew: $s1 -> $s2 -> $s3")
    assert(s1 > 0)
  }

  test("q40: exactly 5 ranked terms per doc with >= 5 distinct terms") {
    val df = SparkEntry.q40Tfidf(spark, SfDir).cache()
    assert(df.where(col("rank") < 1 || col("rank") > 5).count() == 0)
    val badDocs = df.groupBy("doc_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .where(col("n") =!= col("mx")).count()
    assert(badDocs == 0, "rank sequence must be dense per doc")
    // a term appearing in every doc has idf = ln(1) = 0
    assert(df.where(col("tfidf") < 0).count() == 0)
    df.unpersist()
  }

  test("q45: approx percentiles land within sketch RANK tolerance of the target") {
    // the KLL-style sketch's guarantee is on RANK, not value: the
    // returned value's rank among the group's values must be within
    // n/accuracy (+slack for value-vs-interpolation semantics) of q·n.
    // A value-space bound would be meaningless in a sparse tail.
    val approx = SparkEntry.q45PercentilesApprox(spark, SfDir)
      .selectExpr("event_type",
        "stack(3, 0.5D, p50_approx, 0.9D, p90_approx, 0.99D, p99_approx) AS (q, v)")
    val ev = Tables.events(spark, SfDir).select("event_type", "value")
    val ranked = approx.join(ev, Seq("event_type"))
      .groupBy("event_type", "q", "v")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value") <= col("v"), 1).otherwise(0)).as("rank_le"),
        sum(when(col("value") < col("v"), 1).otherwise(0)).as("rank_lt"))
      .withColumn("target", col("q") * col("n"))
      .withColumn("slack", col("n") / lit(10000) + lit(2))
    val bad = ranked.where(
      col("rank_le") < col("target") - col("slack") ||
        col("rank_lt") > col("target") + col("slack"))
    assert(bad.count() == 0,
      s"approx percentile rank drift: ${bad.collect().mkString(", ")}")
  }
}
