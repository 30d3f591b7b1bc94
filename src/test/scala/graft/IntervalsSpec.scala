package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.Intervals

/** Interval merge semantics pinned on hand cases, then the two
  * rolling-distinct registry forms held together: q85's exact counts
  * (oracle-gated) bound q86's HLL estimates. */
class IntervalsSpec extends SparkSpec {

  private def mergedLongs(rows: Seq[(String, Long, Long)], adjacency: Int = 1) = {
    import spark.implicits._
    Intervals.merge(rows.toDF("k", "s", "e"), Seq("k"), "s", "e", adjacency)
      .as[(String, Long, Long)].collect().toSet
  }

  test("merge fuses overlap and adjacency, keeps gaps and keys apart") {
    // overlap, adjacency (gap of exactly 1), a real gap, a second key
    val rows = Seq(
      ("a", 1L, 3L), ("a", 2L, 5L),   // overlap -> [1,5]
      ("a", 6L, 8L),                   // adjacent to [1,5] -> [1,8]
      ("a", 15L, 20L),                 // gap -> own island
      ("b", 1L, 2L))                   // other key untouched
    assert(mergedLongs(rows) ==
      Set(("a", 1L, 8L), ("a", 15L, 20L), ("b", 1L, 2L)))
    // adjacency 0: only true overlap fuses — [6,8] now stands alone
    assert(mergedLongs(rows, adjacency = 0) ==
      Set(("a", 1L, 5L), ("a", 6L, 8L), ("a", 15L, 20L), ("b", 1L, 2L)))
  }

  test("merge on a date axis, duplicate and contained intervals collapse") {
    import spark.implicits._
    def d(s: String) = Date.valueOf(s)
    val rows = Seq(
      ("u", d("2024-01-01"), d("2024-01-07")),
      ("u", d("2024-01-01"), d("2024-01-07")),  // exact duplicate
      ("u", d("2024-01-03"), d("2024-01-05")),  // contained
      ("u", d("2024-01-08"), d("2024-01-10")),  // adjacent day -> fuses
      ("u", d("2024-02-01"), d("2024-02-02")))
    val got = Intervals.merge(rows.toDF("k", "s", "e"), Seq("k"), "s", "e")
      .as[(String, Date, Date)].collect().toSet
    assert(got == Set(
      ("u", d("2024-01-01"), d("2024-01-10")),
      ("u", d("2024-02-01"), d("2024-02-02"))))
  }

  test("merge is partition-invariant") {
    import spark.implicits._
    val rows = (1 to 200).map(i =>
      (s"k${i % 5}", (i * 7 % 50).toLong, (i * 7 % 50 + i % 9).toLong))
    val one = Intervals.merge(rows.toDF("k", "s", "e").repartition(1),
      Seq("k"), "s", "e").as[(String, Long, Long)].collect().toSet
    val many = Intervals.merge(rows.toDF("k", "s", "e").repartition(17),
      Seq("k"), "s", "e").as[(String, Long, Long)].collect().toSet
    assert(one == many)
  }

  test("q85 exact rolling distinct equals a driver-side recount") {
    import spark.implicits._
    val got = SparkEntry.queries("q85_rolling_distinct")(spark, SfDir)
      .as[(Date, Long)].collect().toMap
    val pairs = Tables.events(spark, SfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().as[(Long, Date)].collect()
    val days = pairs.map(_._2).distinct
    val want = days.map { d =>
      val lo = Date.valueOf(d.toLocalDate.minusDays(6))
      d -> pairs.collect {
        case (u, pd) if !pd.before(lo) && !pd.after(d) => u
      }.distinct.length.toLong
    }.toMap
    assert(got == want, s"rolling distinct diverges: " +
      s"sample=${(got.toSet -- want.toSet).take(3)}")
    // structural sanity (sf0.001's 15 users saturate every window, so
    // flat counts are legitimate): the trailing window dominates the
    // single day, and every observed day reports
    val daily = pairs.groupBy(_._2).map { case (d, ps) =>
      d -> ps.map(_._1).distinct.length.toLong
    }
    assert(daily.keySet == got.keySet)
    daily.foreach { case (d, n) =>
      assert(got(d) >= n, s"rolling < single-day at $d: ${got(d)} < $n")
    }
  }

  test("q86 sketch estimates sit inside HLL's error envelope of q85") {
    import spark.implicits._
    val exact = SparkEntry.queries("q85_rolling_distinct")(spark, SfDir)
      .as[(Date, Long)].collect().toMap
    val est = SparkEntry.queries("q86_rolling_distinct_hll")(spark, SfDir)
      .as[(Date, Long)].collect().toMap
    assert(est.keySet == exact.keySet, "day sets must agree")
    est.foreach { case (day, e) =>
      val x = exact(day)
      // lgConfigK 12 -> ~1.6% typical relative error; 5% is generous
      // and still catches a wrong merge (which is off by whole days)
      assert(math.abs(e - x) <= math.max(2L, (0.05 * x).toLong),
        s"day $day: estimate $e vs exact $x")
    }
  }
}
