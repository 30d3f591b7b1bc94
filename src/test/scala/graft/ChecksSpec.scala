package graft

import org.apache.spark.sql.functions._

import graft.checks.Checks

/** Planted-violation coverage for the data-quality check surface —
  * each check must CATCH its planted defect and stay SILENT on the
  * clean variant (a check that can't fire is worse than no check). */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("noDateGaps flags a holed series and passes a dense one") {
    val holed = Seq(
      ("btc", d("2024-01-01")), ("btc", d("2024-01-02")), ("btc", d("2024-01-04")),
      ("eth", d("2024-01-01")), ("eth", d("2024-01-02")))
      .toDF("asset", "date")
    val v = Checks.noDateGaps(holed, Seq("asset"), "date").collect()
    assert(v.map(_.getString(0)).toSeq == Seq("btc"))
    assert(v.head.getAs[Int]("expected_days") == 4 &&
      v.head.getAs[Long]("actual_days") == 3)

    // duplicate dates also disagree with the span — caught, not hidden
    val duped = Seq(("btc", d("2024-01-01")), ("btc", d("2024-01-01"))).toDF("asset", "date")
    assert(Checks.noDateGaps(duped, Seq("asset"), "date").count() == 0 ||
      Checks.noDateGaps(duped, Seq("asset"), "date").count() == 1)
    // (distinct-date counting: two copies of one date = dense 1-day span)
    assert(Checks.noDateGaps(duped, Seq("asset"), "date").count() == 0)

    val dense = holed.where(col("asset") === "eth")
    assert(Checks.noDateGaps(dense, Seq("asset"), "date").count() == 0)
  }

  test("nonNegative respects the tolerance band") {
    val df = Seq(("a", -0.05), ("b", -0.2), ("c", 3.0)).toDF("k", "balance")
    val v = Checks.nonNegative(df, "balance", tolerance = 0.1)
    assert(v.select("k").as[String].collect().toSeq == Seq("b"))
    assert(Checks.nonNegative(df, "balance", tolerance = 0.3).count() == 0)
  }

  test("nonDecreasing flags a dip; strictlyIncreasing additionally flags a plateau") {
    val df = Seq(
      ("w1", d("2024-01-01"), 10L), ("w1", d("2024-01-02"), 10L), ("w1", d("2024-01-03"), 7L),
      ("w2", d("2024-01-01"), 1L), ("w2", d("2024-01-02"), 2L))
      .toDF("wallet", "date", "cum")
    val dips = Checks.nonDecreasing(df, Seq("wallet"), "date", "cum").collect()
    assert(dips.length == 1 && dips.head.getAs[Long]("cum") == 7L &&
      dips.head.getAs[Long]("prev_cum") == 10L)
    val flats = Checks.strictlyIncreasing(df, Seq("wallet"), "date", "cum")
    assert(flats.count() == 2) // the plateau AND the dip
    // clean strictly-increasing series pass both
    val clean = df.where(col("wallet") === "w2")
    assert(Checks.nonDecreasing(clean, Seq("wallet"), "date", "cum").count() == 0)
    assert(Checks.strictlyIncreasing(clean, Seq("wallet"), "date", "cum").count() == 0)
  }

  test("uniqueKey reports duplicated combinations with their multiplicity") {
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("b", 2)).toDF("k1", "k2")
    val v = Checks.uniqueKey(df, Seq("k1", "k2")).collect()
    assert(v.length == 1 && v.head.getAs[Long]("n_rows") == 3L)
    assert(Checks.uniqueKey(df.distinct(), Seq("k1", "k2")).count() == 0)
  }

  test("orphans finds child keys missing from the parent") {
    val child = Seq((1, "x"), (2, "y"), (9, "z")).toDF("fk", "payload")
    val parent = Seq((1, "p1"), (2, "p2")).toDF("pk", "name")
    val v = Checks.orphans(child, Seq("fk"), parent, Seq("pk"))
    assert(v.select("fk").as[Int].collect().toSeq == Seq(9))
    assert(v.columns.toSeq == child.columns.toSeq, "anti-join must keep the child schema")
  }

  test("latestPerKey + boundedByDim flags only the newest state beyond its bound") {
    val fact = Seq(
      // wallet w1 once exceeded the bound (historical) but is now under
      ("btc", "w1", d("2024-01-01"), 150.0),
      ("btc", "w1", d("2024-01-02"), 50.0),
      // w2's LATEST balance exceeds supply — the actual violation
      ("btc", "w2", d("2024-01-02"), 300.0))
      .toDF("asset", "wallet", "date", "balance")
    val dim = Seq(("btc", 200.0)).toDF("s_asset", "total_supply")
    val latest = Checks.latestPerKey(fact, Seq("asset", "wallet"), "date")
    assert(latest.count() == 2)
    val v = Checks.boundedByDim(latest, "asset", "balance", dim, "s_asset", "total_supply")
    assert(v.select("wallet").as[String].collect().toSeq == Seq("w2"),
      "only the latest over-bound state is a violation")
  }

  test("outliersZScore: planted spike caught; constant and singleton groups are silent") {
    // group g: 20 values at ~10 plus one spike at 1000 — the spike is
    // the only point beyond 3 sigma. group c: constant (stddev 0).
    // group s: singleton (stddev null). Neither may emit.
    val g = (1 to 20).map(i => ("g", i.toLong, 10.0 + (i % 5))) :+ (("g", 99L, 1000.0))
    val rows = (g ++ Seq(("c", 1L, 5.0), ("c", 2L, 5.0), ("s", 1L, 42.0)))
      .toDF("k", "id", "v")
    val out = Checks.outliersZScore(rows, Seq("k"), "v", z = 3.0).collect()
    assert(out.length == 1 && out.head.getAs[Long]("id") == 99L,
      s"exactly the planted spike must flag, got ${out.toSeq}")
    assert(out.head.getAs[Double]("group_stddev") > 0)
    // tighten z until normal points flag too — the dial works
    assert(Checks.outliersZScore(rows, Seq("k"), "v", z = 0.1).count() > 1)
  }

  test("outliersIqr: fences from exact quartiles; inliers pass") {
    // 12 values (1..11 + the spike 100): interpolated ranks 2.75/8.25
    // → q1=3.75, q3=9.25, iqr=5.5 → fences [-4.5, 17.5]; 100 is out
    val rows = ((1 to 11).map(i => ("a", i.toLong, i.toDouble)) :+ (("a", 99L, 100.0)))
      .toDF("k", "id", "v")
    val out = Checks.outliersIqr(rows, Seq("k"), "v", k = 1.5).collect()
    assert(out.length == 1 && out.head.getAs[Long]("id") == 99L)
    assert(out.head.getAs[Double]("group_q1") == 3.75 &&
      out.head.getAs[Double]("group_q3") == 9.25)
    // wider fences admit the spike
    assert(Checks.outliersIqr(rows, Seq("k"), "v", k = 50.0).count() == 0)
  }

  test("reconciles flags only dual-tolerance breaches; null expectations never flag") {
    val df = Seq(
      (1L, 100.0, Some(100.005)),      // under the absolute tolerance → pass
      (2L, 100.0, Some(130.0)),        // breaches both tolerances → flag
      (3L, 1.0e9, Some(1.000000005e9)), // abs diff 5 but relatively tiny → pass
      (4L, 5.0, Option.empty[Double])  // null expectation → not checkable
    ).toDF("id", "actual", "exp")
    val v = Checks.reconciles(df, "actual", col("exp"), tolAbs = 0.01, tolPct = 0.0001)
    assert(v.select("id").as[Long].collect().toSeq == Seq(2L),
      "exactly the dual breach must flag")
    assert(v.columns.contains("expected_value"), "violations must carry the expected value")
  }

  test("q77: the profit identity reconciles exactly on real data") {
    val out = SparkEntry.q77ProfitReconciliation(spark, SfDir).collect()
    try {
      assert(out.nonEmpty)
      // the telescoping identity holds on every checkable row — a
      // violation here means q10's profit math broke
      assert(out.forall(_.getAs[Long]("n_violations") == 0L),
        s"profit identity violated: ${out.toSeq}")
      // and the check is not vacuous: most rows are checkable (only
      // each pair's first row has no lag)
      assert(out.forall(r => r.getAs[Long]("n_checked") > 0 &&
        r.getAs[Long]("n_checked") < r.getAs[Long]("n_rows")))
    } finally { CacheScope.releaseAll(spark): Unit }
  }

  test("summarize yields one count row per rule; assertAll names failing rules") {
    val df = Seq(("a", -5.0), ("b", 1.0)).toDF("k", "v")
    val rules = Seq(
      "neg_v" -> Checks.nonNegative(df, "v"),
      "dup_k" -> Checks.uniqueKey(df, Seq("k")))
    val summary = Checks.summarize(rules)
      .as[(String, Long)].collect().toMap
    assert(summary == Map("neg_v" -> 1L, "dup_k" -> 0L))

    val ex = intercept[IllegalStateException] { Checks.assertAll(rules) }
    assert(ex.getMessage.contains("neg_v") && !ex.getMessage.contains("dup_k"))
    // a clean suite is silent
    Checks.assertAll(Seq("dup_k" -> Checks.uniqueKey(df, Seq("k"))))
  }

  test("q71 plan shape: shared inputs are cached, not re-scanned per rule") {
    spark.catalog.clearCache()
    CacheScope.releaseAll(spark)
    val df = SparkEntry.q71QualityChecks(spark, SfDir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // balances feeds 3 rules and transfers 2 — with the CacheScope
    // persist, those rules read InMemoryTableScan instead of
    // re-deriving the events subtree (runtime exchange reuse does NOT
    // dedupe union branches — this spec is what notices if a refactor
    // drops the persist and silently quintuples the fact scans)
    val cachedReads = "InMemoryTableScan|TableCacheQueryStage".r.findAllIn(plan).length
    assert(cachedReads >= 5, s"expected >=5 cached reads across rules, got $cachedReads")
    CacheScope.releaseAll(spark)
  }

  test("q74 plan shape: derived rates broadcast onto the scan — no corpus shuffle") {
    val plan = SparkEntry.q74BudgetMixture(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "rates must broadcast-join; a sort-merge join here shuffles the corpus")
  }

  test("q71 registry suite: structural invariants hold on real tables") {
    val out = SparkEntry.q71QualityChecks(spark, SfDir)
      .as[(String, Long)].collect().toMap
    assert(out.size == 7)
    // invariants that must hold BY CONSTRUCTION on the derived model:
    // sequences strictly increase, the grain is unique, TPC-H FKs
    // resolve, discounts are fractions, no balance exceeds supply
    Seq("sequence_increasing", "transfers_unique_key", "orders_customer_fk",
      "discount_in_range", "balance_over_supply")
      .foreach(r => assert(out(r) == 0L, s"$r should be violation-free, got ${out(r)}"))
    // and the live rules really fire on this data (same rows q7 cohorts)
    assert(out("balance_negative") > 0L, "synthetic data must contain negative balances")
  }
}
