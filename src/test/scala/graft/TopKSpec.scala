package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.operators.TopK

/** Heavy hitters: the exact form against a naive re-derivation, and
  * the count-min guarantees the q82 rows-only entry leans on. */
class TopKSpec extends SparkSpec {

  test("exact top-k equals the naive groupBy-sort-take per group") {
    import spark.implicits._
    val ev = Tables.events(spark, SfDir)
    val got = TopK.exact(ev, Seq("event_type"), "user_id", 5)
      .select("event_type", "user_id", "cnt", "rk")
      .as[(String, Long, Long, Int)].collect().toSet

    val want = ev.groupBy("event_type", "user_id").count()
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (t, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(5).zipWithIndex
          .map { case ((_, u, c), i) => (t, u, c, i + 1) }
      }.toSet
    assert(got == want, s"exact top-k diverges: ${got -- want} vs ${want -- got}")
  }

  test("count-min estimates never undercount and respect the eps·N bound") {
    import spark.implicits._
    val ev = Tables.events(spark, SfDir)
    val eps = 0.001
    val out = TopK.countMinEstimates(ev, "event_type", "user_id", 5, eps = eps)
      .as[(String, Long, Long, Int, Long)].collect()
    assert(out.nonEmpty)
    val nPerType = ev.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    out.foreach { case (t, u, cnt, _, est) =>
      assert(est >= cnt, s"count-min undercounted ($t, $u): $est < $cnt")
      // one-sided error: overcount ≤ eps·N(group) at 99% confidence —
      // with 5 probes per group the union bound stays comfortable
      assert(est <= cnt + math.ceil(eps * nPerType(t)).toLong,
        s"($t, $u): est $est exceeds cnt $cnt + eps*N ${nPerType(t)}")
    }
  }

  test("count-min partials merge to the whole-data sketch exactly") {
    // mergeability is what makes the sketch the 100 TB form: map-side
    // partials union losslessly (same seed/width/depth), so a
    // distributed build equals a sequential one
    import spark.implicits._
    val users = Tables.events(spark, SfDir).select("user_id").as[Long].collect()
    val (a, b) = users.splitAt(users.length / 2)
    def sketchOf(xs: Array[Long]) = {
      val s = CountMinSketch.create(0.001, 0.99, 42)
      xs.foreach(s.add)
      s
    }
    val whole = sketchOf(users)
    val merged = sketchOf(a).mergeInPlace(sketchOf(b))
    val probes = users.distinct.take(50)
    probes.foreach { u =>
      assert(merged.estimateCount(u) == whole.estimateCount(u),
        s"merge changed the estimate for $u")
    }
  }

  test("count-min probe stays distributed on a planted high-cardinality group universe") {
    import spark.implicits._
    // 15 real users won't stress the group axis — plant ~400 groups
    // so a driver-side sketch collect would be |groups|·sketch-width
    val ev = Tables.events(spark, SfDir)
      .withColumn("g", col("event_id") % 397)
    val out = TopK.countMinEstimates(ev, "g", "user_id", 2, eps = 0.01)

    // the old shape collected every sketch and rebuilt via
    // parallelize — visible as a driver-local leaf. The fix's
    // contract is structural: no driver materialization in the plan.
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan") && !plan.contains("ExistingRDD"),
      s"probe plan materializes through the driver:\n$plan")

    val rows = out.as[(Long, Long, Long, Int, Long)].collect()
    val byGroup = rows.groupBy(_._1)
    assert(byGroup.size > 300, s"planted universe collapsed: ${byGroup.size} groups")
    assert(byGroup.values.forall(_.length <= 2), "more than k candidates in a group")
    rows.foreach { case (g, u, cnt, _, est) =>
      assert(est >= cnt, s"count-min undercounted ($g, $u): $est < $cnt")
    }
  }

  test("the registry pair agrees: q82's candidates are exactly q81's rows") {
    val q81 = SparkEntry.queries("q81_heavy_hitters")(spark, SfDir)
      .collect().map(_.toString).sorted.toSeq
    val q82 = SparkEntry.queries("q82_heavy_hitters_sketch")(spark, SfDir)
      .drop("est_cnt").collect().map(_.toString).sorted.toSeq
    assert(q81 == q82, "sketch query candidates diverge from the exact query")
  }

  test("rrfFuse: hand panel — both-leg ids outrank single-leg, rank columns carry, ties break on id") {
    val sess = spark
    import sess.implicits._
    // lex ranks: a=1 b=2 c=3; vec ranks: b=1 d=2. k0=60:
    //   b: 1/62 + 1/61 ≈ .032520  (both legs — must win)
    //   a: 1/61 ≈ .016393;  d: 1/62 ≈ .016129;  c: 1/63 ≈ .015873
    val lex = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "rank")
    val vec = Seq((11L, 1L), (13L, 2L)).toDF("id", "rank")
    val got = TopK.rrfFuse(Seq("lex" -> lex, "vec" -> vec), "id", "rank")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(11L, 10L, 13L, 12L), got.toSeq)
    // rank columns carry per leg; absent leg is null
    assert(got.head == ((11L, Some(2L), Some(1L),
      BigDecimal(1.0 / 62).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .+(BigDecimal(1.0 / 61).setScale(9, BigDecimal.RoundingMode.HALF_UP))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(2) == ((13L, None, Some(2L),
      BigDecimal(1.0 / 62).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // equal scores (same single-leg rank) break ties on id
    val t = TopK.rrfFuse(Seq(
        "l1" -> Seq((7L, 1L)).toDF("id", "rank"),
        "l2" -> Seq((5L, 1L)).toDF("id", "rank")),
      "id", "rank")
      .collect().map(_.getLong(0)).toSeq
    assert(t == Seq(5L, 7L), t)
  }
}
