package graft

import org.apache.spark.sql.functions._

import graft.operators.Sequence

/** Sequence/funnel-instance matching (operators/Sequence.scala): a
  * hand-computed panel pins the binding rules (strictly-after, first
  * occurrence, per-step gap, no backtracking, per-anchor instances),
  * and the q102 wiring is re-derived independently through the plain
  * join+min formulation the oracle uses. */
class SequenceSpec extends SparkSpec {

  private val DAY = 86400000000L // µs

  test("hand panel: strictness, gaps, no backtracking, per-anchor instances") {
    val sess = spark
    import sess.implicits._
    val ev = Seq(
      // u1: clean 3-step chain; the view at the ANCHOR microsecond
      // must not bind (strictly after), the one at 2000 does
      (1L, 1000L, "signup"),
      (1L, 1000L, "view"),
      (1L, 2000L, "view"),
      (1L, 2500L, "purchase"),
      // u1's SECOND signup anchors its own instance; no view follows
      // it, so the chain dies at step 1 (and step 2 stays null)
      (1L, 3000L, "signup"),
      // u2: first following view arrives past the step-1 gap — the
      // instance fails WITHOUT backtracking to the later in-gap
      // purchase
      (2L, 1000L, "signup"),
      (2L, 1000L + 1500L, "view"),
      (2L, 1000L + 1600L, "purchase"),
      // u3: step 1 in gap, step 2 past ITS gap
      (3L, 1000L, "signup"),
      (3L, 1200L, "view"),
      (3L, 1200L + 2500L, "purchase"))
      .toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("event_type"))

    val got = Sequence.funnelInstances(
        ev, Seq("user_id"), "ts",
        anchorPredicate = col("event_type") === "signup",
        anchorCols = Nil,
        steps = Seq(
          Sequence.Step("t1", col("event_type") === "view", 1000L),
          Sequence.Step("t2", col("event_type") === "purchase", 2000L)))
      .select(col("user_id"), unix_micros(col("t0")).as("a"),
        unix_micros(col("t1")).as("b"), unix_micros(col("t2")).as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSet

    assert(got == Set(
      (1L, 1000L, 2000L, 2500L),
      (1L, 3000L, -1L, -1L),
      (2L, 1000L, -1L, -1L),
      (3L, 1000L, 1200L, -1L)))
  }

  test("longest-match: binds the window's LAST qualifier, never fail-fasts in-window") {
    val sess = spark
    import sess.implicits._
    val ev = Seq(
      // u1: two Bs in window → longest binds the later (3000), first
      // binds the earlier (2000); C after either
      (1L, 1000L, "A"), (1L, 2000L, "B"), (1L, 3000L, "B"), (1L, 3500L, "C"),
      // u2: in-window B at 1500 AND out-of-window B at 9000 — FIRST
      // would bind 1500 (in gap, fine); make the contrast real: the
      // first qualifier is OUT of window (u3) vs longest still binds
      (2L, 1000L, "A"), (2L, 1500L, "B"),
      // u3: first qualifying B is past the gap (fail-fast under
      // first-match), but NO in-window B exists → both forms null
      (3L, 1000L, "A"), (3L, 9000L, "B"))
      .toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("event_type"))

    def run(longest: Boolean) = {
      val steps = Seq(
        Sequence.Step("t1", col("event_type") === "B", 2500L),
        Sequence.Step("t2", col("event_type") === "C", 2000L))
      val out =
        if (longest) Sequence.funnelInstancesLongest(
          ev, Seq("user_id"), "ts", col("event_type") === "A", Nil, steps)
        else Sequence.funnelInstances(
          ev, Seq("user_id"), "ts", col("event_type") === "A", Nil, steps)
      out.select(col("user_id"), unix_micros(col("t1")).as("b1"),
          unix_micros(col("t2")).as("b2"))
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    }
    assert(run(longest = false) == Set(
      (1L, 2000L, 3500L), (2L, 1500L, -1L), (3L, -1L, -1L)))
    assert(run(longest = true) == Set(
      (1L, 3000L, 3500L), (2L, 1500L, -1L), (3L, -1L, -1L)))
  }

  test("q114 longest bind times are ≥ q102's wherever both bind") {
    val first = SparkEntry.q102FunnelInstances(spark, SfDir)
      .select(col("anchor_id"), col("t1").as("f1"))
    val longest = SparkEntry.q114FunnelLongest(spark, SfDir)
      .select(col("anchor_id"), col("t1").as("l1"))
    val both = first.join(longest, "anchor_id")
      .where(col("f1").isNotNull && col("l1").isNotNull)
    assert(both.count() > 0)
    assert(both.where(col("l1") < col("f1")).count() == 0,
      "longest bound earlier than first")
  }

  test("q107: as-of count-difference measures equal the interval join") {
    val ev = Tables.events(spark, SfDir)
    val got = SparkEntry.q107FunnelMeasures(spark, SfDir)

    // independent re-derivation: the direct per-anchor interval join
    // the operator's running-count trick avoids
    val a = ev.where(col("event_type") === "signup")
      .select(col("event_id").as("anchor_id"), col("user_id"), col("ts").as("t0"))
    val cRaw = a.join(
        ev.where(col("event_type") === "purchase").select(col("user_id"), col("ts").as("__c")),
        Seq("user_id"), "left")
      .groupBy("anchor_id", "user_id", "t0")
      .agg(min(when(col("__c") > col("t0"), col("__c"))).as("__m"))
      .withColumn("tc",
        when(unix_micros(col("__m")) - unix_micros(col("t0")) <= 10L * DAY, col("__m")))
      .drop("__m")
    val v = cRaw.where(col("tc").isNotNull).join(
        ev.where(col("event_type") === "view").select(col("user_id"), col("ts").as("__v")),
        Seq("user_id"), "left")
      .groupBy("anchor_id")
      .agg(
        count(when(col("__v") > col("t0") && col("__v") < col("tc"), 1)).as("n"),
        min(when(col("__v") > col("t0") && col("__v") < col("tc"), col("__v"))).as("f"),
        max(when(col("__v") > col("t0") && col("__v") < col("tc"), col("__v"))).as("l"))
    val want = cRaw.join(v, Seq("anchor_id"), "left")
      .select(col("anchor_id"), col("user_id"), col("t0"), col("tc"),
        when(col("tc").isNotNull, coalesce(col("n"), lit(0L))).as("views_between"),
        col("f").as("first_view"), col("l").as("last_view"))

    assert(got.count() == want.count() && got.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "count-difference measures diverge from the interval join")
    // internal consistency: zero views ⇔ no first/last; both depths occur
    assert(got.where(col("views_between") === 0 &&
      (col("first_view").isNotNull || col("last_view").isNotNull)).count() == 0)
    assert(got.where(col("views_between") > 0 &&
      (col("first_view").isNull || col("last_view").isNull)).count() == 0)
    assert(got.where(col("views_between") > 0).count() > 0)
    assert(got.where(col("tc").isNull).count() > 0)
  }

  test("q102 equals the independent join+min re-derivation") {
    val ev = Tables.events(spark, SfDir)
    val a = ev.where(col("event_type") === "signup")
      .select(col("event_id").as("anchor_id"), col("user_id"), col("ts").as("t0"))
    def firstAfter(prev: org.apache.spark.sql.DataFrame, prevT: String,
        evType: String, outT: String, gapUs: Long) = {
      val cand = ev.where(col("event_type") === evType)
        .select(col("user_id"), col("ts").as("__c"))
      prev.join(cand, Seq("user_id"), "left")
        .groupBy(prev.columns.map(col): _*)
        .agg(min(when(col("__c") > col(prevT), col("__c"))).as("__m"))
        .withColumn(outT,
          when(unix_micros(col("__m")) - unix_micros(col(prevT)) <= gapUs,
            col("__m")))
        .drop("__m")
    }
    // conditional min inside the aggregate (not a filter) keeps
    // anchors whose candidates ALL precede them — they must surface
    // with a null step, not disappear
    val w1 = firstAfter(a, "t0", "view", "t1", 3L * DAY)
    val live = w1.where(col("t1").isNotNull)
    val dead = w1.where(col("t1").isNull)
      .withColumn("t2", lit(null).cast("timestamp"))
    val w2 = firstAfter(live, "t1", "purchase", "t2", 7L * DAY)
      .unionByName(dead)
    val want = w2.select(
      col("anchor_id"), col("user_id"), col("t0"), col("t1"), col("t2"),
      (unix_micros(col("t1")) - unix_micros(col("t0"))).as("dur01_us"),
      (unix_micros(col("t2")) - unix_micros(col("t1"))).as("dur12_us"),
      (lit(1L) + when(col("t1").isNotNull, 1L).otherwise(0L)
        + when(col("t2").isNotNull, 1L).otherwise(0L)).as("steps_done"))

    val got = SparkEntry.q102FunnelInstances(spark, SfDir)
    assert(got.count() > 0 && got.count() ==
      ev.where(col("event_type") === "signup").count(),
      "one instance per anchor event")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "as-of chain diverges from the join+min re-derivation")
    // the gap caps and step failures do real work on this data: all
    // three completion depths are represented
    assert(got.select("steps_done").distinct().count() == 3)
  }
}
