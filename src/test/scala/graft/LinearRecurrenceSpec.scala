package graft

import org.apache.spark.sql.functions._

import graft.operators.LinearRecurrence

/** q177 (operators/LinearRecurrence): trailing Holt smoothing. Pins
  * the windowed convolution against the SEQUENTIAL Holt recurrence
  * itself (exact while the series is shorter than the window — zero
  * truncation), the gap semantics, ramp behavior (positive trend,
  * level tracking — what the EWMA cannot do), and the weight
  * closed-form invariants. */
class LinearRecurrenceSpec extends SparkSpec {
  import spark.implicits._

  test("weights: DC gain invariants of the exact integer impulse response") {
    val (lvl, trd) = LinearRecurrence.holtWeights(16)
    assert(lvl.length == 16 && trd.length == 16)
    // infinite level response has unit DC gain and the trend response
    // zero; the w=16 truncation drops |λ|^16 = 2^-8 of response mass —
    // the sums must sit within that band of 4^16 and 0
    val denom = BigInt(4).pow(16)
    assert((denom - lvl.sum).abs < denom / 128,
      s"level weights lost more than the truncation tail: ${lvl.sum} vs $denom")
    assert(trd.sum.abs < denom / 16,
      s"trend weights must nearly cancel: ${trd.sum}")
    // lag-0 weights are the recurrence's own first step: ½ and ¼
    assert(lvl.head == BigInt(2) * BigInt(4).pow(15))
    assert(trd.head == BigInt(4).pow(15))
  }

  test("series shorter than the window: convolution == the sequential recurrence, exactly") {
    // 12 consecutive days, one asset — no truncation in play, so the
    // windowed sum must equal running Holt from zero init
    val ys = Seq(3.5, 4.25, 2.0, 6.75, 5.5, 5.0, 7.25, 8.0, 6.5, 9.75, 10.0, 11.25)
    val daily = ys.zipWithIndex
      .map { case (v, i) => ("A", 100L + i, math.round(v * 1e6)) }
      .toDF("asset", "day_i", "micro")
    val got = LinearRecurrence.holtSmooth(daily, "asset", "day_i", "micro")
      .collect().map(r => r.getLong(1) -> ((r.getDouble(3), r.getDouble(4)))).toMap

    var level = 0.0
    var trend = 0.0
    ys.zipWithIndex.foreach { case (y, i) =>
      val prev = level
      level = 0.5 * y + 0.5 * (level + trend)
      trend = 0.5 * (level - prev) + 0.5 * trend
      val (gl, gt) = got(100L + i)
      assert(math.abs(gl - level) < 1e-5,
        s"day $i level: got $gl want $level")
      assert(math.abs(gt - trend) < 1e-5,
        s"day $i trend: got $gt want $trend")
    }
    assert(got.size == 12)
  }

  test("ramp: trend converges positive and the level tracks where an EWMA lags") {
    // y_t = t exactly: Holt's whole point — the trend estimate picks
    // up the slope, so level stops lagging the ramp
    val daily = (0 until 16).map(i => ("A", 200L + i, i * 1000000L))
      .toDF("asset", "day_i", "micro")
    val got = LinearRecurrence.holtSmooth(daily, "asset", "day_i", "micro")
      .where(col("day") === 215L).collect()(0)
    val (level, trend) = (got.getDouble(3), got.getDouble(4))
    assert(trend > 0.8 && trend < 1.2, s"ramp slope ≈ 1, got $trend")
    assert(math.abs(level - 15.0) < 1.0,
      s"Holt level must track the ramp (an EWMA would sit ~2 behind): $level")
  }

  test("gaps contribute nothing; keys never mix") {
    val daily = Seq(
      ("A", 10L, 1000000L), ("A", 12L, 3000000L), // day 11 missing
      ("B", 12L, 9000000L))
      .toDF("asset", "day_i", "micro")
    val rows = LinearRecurrence.holtSmooth(daily, "asset", "day_i", "micro")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows(("A", 12L)) == 2L && rows(("A", 10L)) == 1L)
    assert(rows(("B", 12L)) == 1L, "a B day must not see A's observations")
  }
}
