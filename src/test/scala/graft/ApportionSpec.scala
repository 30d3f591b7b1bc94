package graft

import org.apache.spark.sql.functions._

import graft.operators.Apportion

/** q194 (operators.Apportion + text.Bpe.tokenBudget): largest-
  * remainder apportionment. Hand cases pin the floor quotas, the
  * remainder-ranked top-up, the deterministic remainder tie-break,
  * and the exact-sum invariant; the registry query's targets sum to
  * the budget on the real testdata. */
class ApportionSpec extends SparkSpec {
  import spark.implicits._

  private def run(weights: Seq[(String, Long)], budget: Long) =
    Apportion.largestRemainder(
      weights.toDF("k", "w"), "k", "w", budget)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(2))).toSeq

  test("floor quotas + largest-remainder top-up; targets sum to the budget exactly") {
    // W=7, B=10: quotas 30/7, 30/7, 10/7 → floors 4,4,1 (Σ9); de's
    // remainder 3 beats the 2s → de takes the open seat
    assert(run(Seq(("de", 1L), ("en", 3L), ("fr", 3L)), 10L) ==
      Seq(("de", 2L), ("en", 4L), ("fr", 4L)))
    // B=9: floors 3,3,1 (Σ7), two seats open; en and fr tie at
    // remainder 6 and both rank above de's 2 → en, fr
    assert(run(Seq(("de", 1L), ("en", 3L), ("fr", 3L)), 9L) ==
      Seq(("de", 1L), ("en", 4L), ("fr", 4L)))
    // remainder TIE with one seat: key ASC wins — en, not fr
    // (W=2, B=3: floors 1,1; remainders 1,1)
    assert(run(Seq(("en", 1L), ("fr", 1L)), 3L) ==
      Seq(("en", 2L), ("fr", 1L)))
  }

  test("degenerate shapes: zero weights, zero budget, single key") {
    // a zero-weight key takes a seat only from the remainder pool
    // (rem 0 ranks last — here the seats go to the weighted keys)
    assert(run(Seq(("a", 0L), ("b", 1L)), 5L) == Seq(("a", 0L), ("b", 5L)))
    assert(run(Seq(("a", 2L), ("b", 3L)), 0L) == Seq(("a", 0L), ("b", 0L)))
    assert(run(Seq(("only", 7L)), 42L) == Seq(("only", 42L)))
  }

  test("corpus-scale magnitudes: w·budget beyond Long stays exact (decimal numerator)") {
    // weights ~1e13 words × budget 1e12 tokens: the long product
    // (~1e25) wraps silently under non-ANSI Spark — the r12 advice
    // case. The decimal(38,0) numerator keeps Hamilton exact: floors
    // + remainder seats sum to the budget and match the BigInt
    // reference allocation.
    val weights = Seq(("en", 9000000000000L), ("zh", 7000000000000L),
      ("de", 1000000000007L), ("fr", 999999999993L))
    val budget = 1000000000000L
    val got = run(weights, budget)
    assert(got.map(_._2).sum == budget, s"leaked: $got")
    val wtot = weights.map(_._2).sum
    val floors = weights.map { case (k, w) =>
      (k, (BigInt(w) * budget / wtot).toLong,
        (BigInt(w) * budget % wtot).toLong) }
    val open = budget - floors.map(_._2).sum
    val topUp = floors.sortBy { case (k, _, rem) => (-rem, k) }
      .take(open.toInt).map(_._1).toSet
    val want = floors.map { case (k, f, _) =>
      (k, f + (if (topUp(k)) 1L else 0L)) }.sortBy(_._1)
    assert(got == want, s"got $got want $want")
  }

  test("negative weights are rejected, not silently apportioned") {
    val ex = intercept[Exception] {
      run(Seq(("a", 5L), ("b", -1L)), 10L)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("negative weight")),
      s"wrong error: ${messages(ex).mkString(" | ")}")
  }

  test("q201: tempered budget — exact isqrt weights, tail languages gain share") {
    val got = SparkEntry.q201TokenBudgetTempered(spark, SfDir).persist()
    assert(got.agg(sum("target_tokens")).head.getLong(0) == 1000000L)
    val rows = got.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(3), r.getLong(4))).toSeq
    // the weight column IS the exact integer sqrt of the word mass
    rows.foreach { case (lang, w, s, _) =>
      assert(s * s <= w && (s + 1) * (s + 1) > w, s"$lang: isqrt($w) != $s")
    }
    // Hamilton exactness against the tempered float shares
    val sTot = rows.map(_._3).sum
    rows.foreach { case (lang, _, s, t) =>
      val tempered = s.toDouble * 1000000 / sTot
      assert(math.abs(t - tempered) < 1.0,
        s"$lang: target $t vs exact tempered share $tempered")
    }
    // tempering moves share from the head to the tail: vs the raw q194
    // plan, the largest-mass language can only LOSE tokens and the
    // smallest can only GAIN (the α = 1/2 interpolation is guaranteed
    // at the extremes; ±1 slack for Hamilton seats)
    val raw = SparkEntry.q194TokenBudget(spark, SfDir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val maxLang = rows.maxBy(_._2)
    val minLang = rows.minBy(_._2)
    assert(maxLang._4 <= raw(maxLang._1) + 1,
      s"head ${maxLang._1} gained share under tempering")
    assert(minLang._4 >= raw(minLang._1) - 1,
      s"tail ${minLang._1} lost share under tempering")
    got.unpersist(): Unit
  }

  test("q205: the mixture sweep's alpha ladder — endpoints reproduce raw and uniform") {
    val got = SparkEntry.q205MixtureSweep(spark, SfDir).persist()
    // every alpha's targets sum to the budget exactly
    val sums = got.groupBy("alpha_ppm").agg(sum("target_tokens").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums.values.toSet == Set(1000000L), s"per-alpha sums $sums")
    // alpha = 1 row-matches q194's raw plan
    val raw = SparkEntry.q194TokenBudget(spark, SfDir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    got.where(col("alpha_ppm") === 1000000L).collect().foreach { r =>
      assert(r.getLong(4) == raw(r.getString(1)),
        s"alpha=1 diverged from q194 at ${r.getString(1)}")
    }
    // alpha = 0 is uniform within one Hamilton seat
    val k = raw.size
    got.where(col("alpha_ppm") === 0L).collect().foreach { r =>
      assert(math.abs(r.getLong(4) - 1000000.0 / k) < 1.0,
        s"alpha=0 not uniform at ${r.getString(1)}: ${r.getLong(4)}")
    }
    // the ladder is monotone at the extremes: the largest language's
    // target never increases as alpha falls, the smallest's never
    // decreases (same guarantee family as q201's head/tail pins)
    val byAlpha = got.collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => r.getString(1) -> r.getLong(4)).toMap).toMap
    val words = got.where(col("alpha_ppm") === 1000000L).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val (head, tail) = (words.maxBy(_._2)._1, words.minBy(_._2)._1)
    val ladder = Seq(1000000L, 500000L, 250000L, 0L)
    ladder.sliding(2).foreach { case Seq(hi, lo) =>
      assert(byAlpha(lo)(head) <= byAlpha(hi)(head) + 1,
        s"head $head gained share from alpha $hi to $lo")
      assert(byAlpha(lo)(tail) >= byAlpha(hi)(tail) - 1,
        s"tail $tail lost share from alpha $hi to $lo")
      case _ => ()
    }
    // and the isqrt ladder columns are the exact integer roots
    got.where(col("alpha_ppm") === 500000L).collect().foreach { r =>
      val (w, s) = (r.getLong(2), r.getLong(3))
      assert(s * s <= w && (s + 1) * (s + 1) > w, s"isqrt($w) != $s")
    }
    got.unpersist(): Unit
  }

  test("isqrt correction: exact at perfect squares, off-by-one floats, and huge inputs") {
    val sess = spark
    import sess.implicits._
    // the q201 expression, standalone (division-form corrections)
    val s0 = "CAST(FLOOR(SQRT(CAST(n_words AS DOUBLE))) AS BIGINT)"
    val s1 = s"($s0 - (CASE WHEN $s0 > n_words div GREATEST($s0, 1) THEN 1 ELSE 0 END))"
    val s2 = s"($s1 + (CASE WHEN n_words div ($s1 + 1) >= $s1 + 1 THEN 1 ELSE 0 END))"
    val cases = Seq(0L, 1L, 2L, 3L, 4L, 15L, 16L, 17L,
      999999999999L, 1000000000000L, 1000000000001L, // around 1e6²
      4611686014132420608L, // (2^31 + 10)² − 1-ish region past 2^53
      4611686018427387903L, // 2^62 − 1
      Long.MaxValue)
    val got = cases.toDF("n_words").selectExpr("n_words", s"$s2 AS s")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (n, s) =>
      val ref = new java.math.BigInteger(n.toString).sqrt().longValueExact()
      assert(s == ref, s"isqrt($n): got $s want $ref")
    }
  }

  test("q194 on the real testdata: targets sum to the budget, share follows word mass") {
    val got = SparkEntry.q194TokenBudget(spark, SfDir).persist()
    val tot = got.agg(sum("target_tokens")).head.getLong(0)
    assert(tot == 1000000L, s"apportionment leaked: $tot")
    // proportionality sanity: every language's target is within one
    // seat of its exact float share (Hamilton's defining property)
    val w = got.agg(sum("n_words")).head.getLong(0)
    got.collect().foreach { r =>
      val exact = r.getLong(1).toDouble * 1000000L / w
      val target = r.getLong(3)
      assert(math.abs(target - exact) < 1.0,
        s"${r.getString(0)}: target $target vs exact share $exact")
    }
    got.unpersist(): Unit
  }
}
