package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random fixture: points and intervals on a
  // signed axis with boundary hits, empty intervals, and multi-bin
  // spans — every (point, interval) relation class represented
  private def points = (0L until 200L)
    .map(i => (i, (i * 7919L % 401L) - 200L)) // axis in [-200, 200]
    .toDF("pid", "x")

  private def intervals = (0L until 60L).map { j =>
    val lo = (j * 104729L % 379L) - 190L
    val len = (j * 31L % 45L) - 4L // negative len ⇒ empty interval (lo > hi)
    (j, lo, lo + len)
  }.toDF("iid", "lo", "hi")

  private def naive = points.crossJoin(intervals)
    .where(col("x").between(col("lo"), col("hi")))

  test("equals the naive BETWEEN join — boundaries, negatives, empty intervals") {
    val got = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", binWidth = 10)
    assert(got.exceptAll(naive).count() == 0 && naive.exceptAll(got).count() == 0,
      "bin-bucketed range join diverges from the naive BETWEEN join")
    // no duplicate pairs by construction: pair count equals distinct pair count
    assert(got.select("pid", "iid").count() == got.select("pid", "iid").distinct().count(),
      "a (point, interval) pair met in more than one bin")
  }

  test("binWidth is a physical knob, not a semantic one") {
    val expected = naive.count()
    for (w <- Seq(1L, 3L, 50L, 1000L)) {
      val n = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", binWidth = w).count()
      assert(n == expected, s"binWidth=$w changed the result: $n != $expected")
    }
  }

  test("extraKeys partition the match space like an equi-join") {
    val kp = points.withColumn("k", (col("pid") % 3).cast("int"))
    val ki = intervals.withColumn("k", (col("iid") % 3).cast("int"))
    val got = RangeJoin.pointInInterval(kp, ki, "x", "lo", "hi",
      binWidth = 10, extraKeys = Seq("k"))
    val want = kp.as("p").join(ki.as("i"),
        col("p.k") === col("i.k") && col("p.x").between(col("i.lo"), col("i.hi")))
      .select(col("p.pid"), col("p.x"), col("p.k"), col("i.iid"), col("i.lo"), col("i.hi"))
    assert(got.select("pid", "iid").exceptAll(want.select("pid", "iid")).count() == 0 &&
      want.select("pid", "iid").exceptAll(got.select("pid", "iid")).count() == 0,
      "keyed range join diverges from the keyed BETWEEN join")
  }

  test("exact binning beyond double's 2^53 mantissa") {
    // 2^60-magnitude axis: double division would collapse neighboring
    // bins (ulp at 2^60 is 256), integer/decimal floor-division must not
    val base = 1L << 60
    val bigPts = Seq((1L, base + 5L), (2L, base + 15L), (3L, -base - 5L))
      .toDF("pid", "x")
    val bigItv = Seq((10L, base + 0L, base + 9L), (11L, -base - 9L, -base - 1L))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(bigPts, bigItv, "x", "lo", "hi", binWidth = 10)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (3L, 11L)),
      s"large-magnitude binning produced wrong pairs: $got")
  }

  test("an open-ended sentinel interval fails fast with a clear error") {
    for (itv <- Seq(
        (99L, 0L, Long.MaxValue),            // half-open sentinel
        (98L, Long.MinValue, Long.MaxValue)  // full-range: span would WRAP a long
      )) {
      val sentinel = Seq(itv).toDF("iid", "lo", "hi")
      val ex = intercept[Exception] {
        RangeJoin.pointInInterval(points, sentinel, "x", "lo", "hi", binWidth = 1).count()
      }
      val msg = Option(ex.getMessage).getOrElse("") +
        Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.contains("spans more than"),
        s"expected the RangeJoin span guard to fire for $itv, got: $ex")
    }
  }

  test("bin boundaries are exact at large binWidths (no decimal HALF_UP drift)") {
    // with decimal(38,6) division, 99_999_999 / 1e8 = 0.999999 99 →
    // rounds to 1.000000 → floor = 1: the point would visit bin 1 and
    // MISS an interval living in bin 0. Integral floor-div must not.
    val pts = Seq((1L, 99999999L), (2L, -99999999L)).toDF("pid", "x")
    val itv = Seq((10L, 0L, 99999999L), (11L, -100000000L, -1L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, itv, "x", "lo", "hi", binWidth = 100000000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 11L)), s"boundary mis-binning: $got")
  }

  test("the plan is an equi-join on the bin key — no nested loop, no cartesian") {
    val plan = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", binWidth = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
  }

  // second interval fixture on the same axis for the overlap join:
  // varied lengths (incl. empty), boundary-touching pairs, multi-bin
  // spans on both sides
  private def intervalsB = (0L until 45L).map { j =>
    val lo = (j * 7907L % 367L) - 180L
    val len = (j * 17L % 38L) - 3L
    (j, lo, lo + len)
  }.toDF("bid", "blo", "bhi")

  // the naive form must state the SAME convention the operator (and
  // pointInInterval) uses: an empty interval (lo > hi) matches
  // nothing — the bare theta condition alone would still pair an
  // empty interval whose bounds straddle the other side
  private def naiveOverlap = intervals.where(col("lo") <= col("hi"))
    .crossJoin(intervalsB.where(col("blo") <= col("bhi")))
    .where(col("lo") <= col("bhi") && col("blo") <= col("hi"))

  test("intervalOverlap equals the naive theta join — touching bounds, empties, multi-bin pairs") {
    val got = RangeJoin.intervalOverlap(intervals, intervalsB,
      "lo", "hi", "blo", "bhi", binWidth = 10)
    assert(got.exceptAll(naiveOverlap).count() == 0 &&
      naiveOverlap.exceptAll(got).count() == 0,
      "bin-bucketed overlap join diverges from the naive theta join")
    // structural dedupe: a pair sharing several bins survives ONCE
    assert(got.select("iid", "bid").count() ==
      got.select("iid", "bid").distinct().count(),
      "an interval pair met in more than one surviving bin")
  }

  test("intervalOverlap: binWidth is a physical knob, not a semantic one") {
    val expected = naiveOverlap.count()
    for (w <- Seq(1L, 3L, 50L, 1000L)) {
      val n = RangeJoin.intervalOverlap(intervals, intervalsB,
        "lo", "hi", "blo", "bhi", binWidth = w).count()
      assert(n == expected, s"binWidth=$w changed the result: $n != $expected")
    }
  }

  test("intervalOverlap keeps the equi-join plan shape") {
    val plan = RangeJoin.intervalOverlap(intervals, intervalsB,
      "lo", "hi", "blo", "bhi", binWidth = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"overlap join fell back to a nested loop:\n$plan")
  }

  test("q98: allocation parts are exact floor shares of the campaign budget") {
    val df = SparkEntry.q98IntervalAllocation(spark, SfDir).cache()
    try {
      assert(df.count() > 0)
      // every pair contributes at least one day
      assert(df.where(col("overlap_days") < col("n_intervals")).count() == 0)
      // per campaign: floor shares sum to within |tiers| millis of the
      // full budget, and never exceed it
      val perCampaign = df.groupBy("campaign_id")
        .agg(sum("allocated_milli").as("alloc"),
          count(lit(1)).as("n_tiers"),
          ((first(col("campaign_id")) % 7 + 1) * lit(1000L) * lit(1000L)).as("budget_milli"))
      assert(perCampaign.where(col("alloc") > col("budget_milli")).count() == 0,
        "allocation exceeded the budget")
      assert(perCampaign
        .where(col("alloc") < col("budget_milli") - col("n_tiers"))
        .count() == 0,
        "floor-division loss exceeded one milli per tier")
    } finally { df.unpersist(): Unit }
  }

  test("q149's trailing merge rides the bin rewrite: naive-form equality + equi-join plan shape") {
    // the r14-verdict cleanup: the trailing EWMA merge used to join
    // the daily aggregate on asset alone with the 16-day band as a
    // post-join filter — O(|days|² per asset) pairs. The bin rewrite
    // makes candidates O(|days|·w) while the band re-applies, so the
    // rows are IDENTICAL (the oracle hash also pins this at the gate)
    val got = SparkEntry.q149Ewma(spark, SfDir)
    val daily = Tables.events(spark, SfDir)
      .groupBy(col("event_type").as("asset"), to_date(col("ts")).as("date"))
      .agg((round(max("value"), 6).cast("decimal(18,6)") * 1000000L)
        .cast("long").as("micro"))
      .withColumn("day_i", datediff(col("date"), lit("1970-01-01").cast("date")))
    val r = daily.select(
      col("asset"), col("day_i").as("r_day"), col("micro").as("r_micro"))
    val want = daily.join(r, Seq("asset"))
      .where(col("r_day").between(col("day_i") - 15, col("day_i")))
      .withColumn("w", expr("shiftleft(1L, 15 - cast(day_i - r_day as int))"))
      .groupBy(col("asset"), col("date"))
      .agg(sum(col("w") * col("r_micro")).as("num"),
        sum(col("w")).as("den"), count(lit(1)).as("n_obs"))
      .select(col("asset"), col("date"), col("n_obs"),
        round(col("num").cast("double") / col("den").cast("double") / 1e6, 6)
          .as("ewma"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "q149 bin rewrite diverges from the naive band join")
    // plan shape: the merge join carries the bin key (no asset-only
    // join with a band filter, no nested loop)
    val plan = got.queryExecution.optimizedPlan.toString
    assert(plan.contains("__bin"), s"q149 lost the bin join key:\n$plan")
    val phys = got.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoop") && !phys.contains("CartesianProduct"),
      s"q149 fell back to a nested loop:\n$phys")
    graft.CacheScope.releaseAll(spark): Unit
  }

  test("q52 equals its own naive form on real testdata") {
    val got = SparkEntry.q52RangeCampaignJoin(spark, SfDir)
    val anchor = to_date(lit("2024-01-01"))
    val cIdx = expr("o_orderkey div 300")
    val campaigns = Tables.orders(spark, SfDir)
      .where(col("o_orderkey") % 300 === 0)
      .select(col("o_orderkey").as("campaign_id"),
        date_add(anchor, (cIdx % 28).cast("int")).as("lo"),
        date_add(anchor, (cIdx % 28 + cIdx % 7 + 1).cast("int")).as("hi"))
    val want = Tables.events(spark, SfDir)
      .select(col("user_id"), col("value"), to_date(col("ts")).as("d"))
      .join(campaigns, col("d").between(col("lo"), col("hi")))
      .groupBy("campaign_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        round(sum("value"), 6).as("total_value"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "q52 diverges from its naive BETWEEN form")
    assert(got.count() > 0, "q52 must produce campaigns at sf0.001")
  }
}
