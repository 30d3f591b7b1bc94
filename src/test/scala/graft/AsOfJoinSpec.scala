package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def quotes = Seq(
    ("btc", "2024-01-05", 100.0),
    ("btc", "2024-01-10", 110.0),
    ("eth", "2024-01-08", 50.0))
    .toDF("asset", "qd", "price")
    .select(col("asset"), to_date(col("qd")).as("price_date"), col("price"))

  private def probes = Seq(
    ("btc", "2024-01-04", 1L), // before first quote → null
    ("btc", "2024-01-05", 2L), // ON a quote date → inclusive match
    ("btc", "2024-01-07", 3L), // between quotes → earlier quote
    ("btc", "2024-01-30", 4L), // far after last quote
    ("eth", "2024-01-09", 5L), // other key
    ("ltc", "2024-01-09", 6L)) // key with NO quotes at all
    .toDF("asset", "pd", "row_id")
    .select(col("asset"), to_date(col("pd")).as("date"), col("row_id"))

  test("backward-inclusive semantics: boundary, gap, missing-key, pre-quote rows") {
    val got = AsOfJoin.asOf(probes, quotes, Seq("asset"), "date", "price_date", Seq("price"))
      .select("row_id", "price_date", "price")
      .as[(Long, Option[java.sql.Date], Option[Double])]
      .collect().map(r => r._1 -> ((r._2.map(_.toString), r._3))).toMap
    assert(got(1L) == ((None, None)), "probe before the first quote must not match")
    assert(got(2L) == ((Some("2024-01-05"), Some(100.0))), "same-day quote must match (inclusive)")
    assert(got(3L) == ((Some("2024-01-05"), Some(100.0))), "between quotes → most recent earlier")
    assert(got(4L) == ((Some("2024-01-10"), Some(110.0))), "after last quote → last quote")
    assert(got(5L) == ((Some("2024-01-08"), Some(50.0))), "keys must not bleed")
    assert(got(6L) == ((None, None)), "key with no quotes → null match")
  }

  test("NULL keys never match — equi-join semantics, not window-partition semantics") {
    val nq = quotes.unionByName(
      Seq(("x", "2024-01-01", 999.0)).toDF("asset", "qd", "price")
        .select(lit(null).cast("string").as("asset"),
          to_date(col("qd")).as("price_date"), col("price")))
    val np = probes.unionByName(
      Seq(("x", "2024-01-09", 7L)).toDF("asset", "pd", "row_id")
        .select(lit(null).cast("string").as("asset"),
          to_date(col("pd")).as("date"), col("row_id")))
    val got = AsOfJoin.asOf(np, nq, Seq("asset"), "date", "price_date", Seq("price"))
      .select("row_id", "price")
      .as[(Long, Option[Double])].collect().toMap
    assert(got.size == 7, "NULL-keyed probe must still pass through")
    assert(got(7L).isEmpty, "a NULL-keyed probe must NOT match a NULL-keyed quote")
    assert(got(3L).contains(100.0), "non-NULL rows unaffected by NULL-keyed inputs")
  }

  test("tolerance nulls matches older than maxGapDays") {
    val got = AsOfJoin.asOf(probes, quotes, Seq("asset"), "date", "price_date", Seq("price"),
      maxGapDays = Some(3))
      .select("row_id", "price")
      .as[(Long, Option[Double])].collect().toMap
    assert(got(2L).contains(100.0), "gap 0 within tolerance")
    assert(got(3L).contains(100.0), "gap 2 within tolerance")
    assert(got(4L).isEmpty, "gap 20 beyond tolerance must null out")
  }

  test("equals the naive theta-join + max-per-probe definition on real transfers") {
    // the declarative definition: join every quote at-or-before the
    // probe, keep the latest — quadratic per key, but unimpeachable
    val probes = Tables.transfers(spark, SfDir)
    val quotes = Tables.prices(spark, SfDir)
      .where(dayofmonth(col("date")) % 3 === 0)
      .select(col("asset"), col("date").as("price_date"), col("price"))

    val got = AsOfJoin.asOf(probes, quotes, Seq("asset"), "date", "price_date", Seq("price"))

    val naive = probes.as("p")
      .join(quotes.as("q"),
        col("p.asset") === col("q.asset") && col("q.price_date") <= col("p.date"),
        "left")
      .groupBy(probes.columns.map(c => col("p." + c)): _*)
      .agg(max(struct(col("q.price_date"), col("q.price"))).as("m"))
      .select(probes.columns.map(c => col(c)) ++
        Seq(col("m.price_date").as("price_date"), col("m.price").as("price")): _*)

    assert(got.count() == probes.count(), "as-of join must preserve probe cardinality")
    assert(got.exceptAll(naive).count() == 0 && naive.exceptAll(got).count() == 0,
      "union+window as-of join diverges from the naive theta-join definition")
  }

  test("forward direction: earliest at-or-after quote, nulls after the last quote") {
    val got = AsOfJoin.asOfForward(probes, quotes, Seq("asset"), "date", "price_date",
      Seq("price"))
      .select("row_id", "price_date", "price")
      .as[(Long, Option[java.sql.Date], Option[Double])]
      .collect().map(r => r._1 -> ((r._2.map(_.toString), r._3))).toMap
    assert(got(1L) == ((Some("2024-01-05"), Some(100.0))), "before first quote → first quote")
    assert(got(2L) == ((Some("2024-01-05"), Some(100.0))), "same-day quote matches (inclusive)")
    assert(got(3L) == ((Some("2024-01-10"), Some(110.0))), "between quotes → next quote")
    assert(got(4L) == ((None, None)), "after the last quote → null")
    assert(got(5L) == ((None, None)), "eth probe at Jan 9 is past eth's only quote (Jan 8)")
    assert(got(6L) == ((None, None)), "key with no quotes → null")
  }

  test("forward tolerance nulls matches farther than maxGapDays ahead") {
    val got = AsOfJoin.asOfForward(probes, quotes, Seq("asset"), "date", "price_date",
      Seq("price"), maxGapDays = Some(1))
      .select("row_id", "price")
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(100.0), "probe Jan 4 → quote Jan 5: gap 1 within tolerance")
    assert(got(2L).contains(100.0), "gap 0 within tolerance")
    assert(got(3L).isEmpty, "probe Jan 7 → quote Jan 10 is 3 days ahead, beyond 1")
  }

  test("forward equals the naive theta-join + min-per-probe definition on real transfers") {
    val probes = Tables.transfers(spark, SfDir)
    val quotes = Tables.prices(spark, SfDir)
      .where(dayofmonth(col("date")) % 3 === 0)
      .select(col("asset"), col("date").as("price_date"), col("price"))
    val got = AsOfJoin.asOfForward(probes, quotes, Seq("asset"), "date", "price_date",
      Seq("price"))
    val naive = probes.as("p")
      .join(quotes.as("q"),
        col("p.asset") === col("q.asset") && col("q.price_date") >= col("p.date"),
        "left")
      .groupBy(probes.columns.map(c => col("p." + c)): _*)
      .agg(min_by(struct(col("q.price_date"), col("q.price")),
        struct(col("q.price_date"), -col("q.price"))).as("m"))
      .select(probes.columns.map(c => col(c)) ++
        Seq(col("m.price_date").as("price_date"), col("m.price").as("price")): _*)
    assert(got.count() == probes.count(), "forward as-of must preserve probe cardinality")
    assert(got.exceptAll(naive).count() == 0 && naive.exceptAll(got).count() == 0,
      "forward as-of diverges from the naive theta-join definition")
  }

  test("forward maxGapDays on a numeric axis fails fast at the call site") {
    // numeric axes negate fine WITHOUT a gap, but datediff over a
    // numeric column would analyze to an unrelated cast error deep in
    // the gap filter — the guard must name the real problem up front
    val np = Seq(("btc", 100L, 1L)).toDF("asset", "t", "row_id")
    val nq = Seq(("btc", 105L, 9.0)).toDF("asset", "qt", "price")
    // no gap: numeric axis is supported
    assert(AsOfJoin.asOfForward(np, nq, Seq("asset"), "t", "qt", Seq("price"))
      .count() == 1)
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.asOfForward(np, nq, Seq("asset"), "t", "qt", Seq("price"),
        maxGapDays = Some(3))
    }
    assert(ex.getMessage.contains("maxGapDays"), s"unhelpful error: ${ex.getMessage}")
  }

  test("the plan shuffles once on the key — no nested-loop join") {
    val plan = AsOfJoin.asOf(probes, quotes, Seq("asset"), "date", "price_date", Seq("price"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"as-of join fell back to a nested loop:\n$plan")
  }
}
