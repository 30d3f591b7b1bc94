package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact trailing HOLT smoothing — the second-order depth behind
  * q149's first-order EWMA (the reference's analytics smooth balance
  * and price series before charting/thresholding; Holt's linear
  * method is the standard next step when the series TRENDS, because
  * a plain EWMA lags a ramp by construction).
  *
  * Holt with α = β = 1/2:
  * {{{
  *   level_t = ½·y_t + ½·(level_{t−1} + trend_{t−1})
  *   trend_t = ½·(level_t − level_{t−1}) + ½·trend_{t−1}
  * }}}
  * is the linear state recurrence s_t = A·s_{t−1} + c·y_t with
  * A = [[½, ½], [−¼, ¾]] and c = (½, ¼)ᵀ, so the state is the
  * convolution of the inputs with the IMPULSE RESPONSE A^k·c. 4A and
  * 4c are INTEGER, so every lag weight is an exact integer over the
  * common denominator 4^w: W(k) = ((4A)^k·(4c)) · 4^(w−1−k) — the
  * same move that made q149's 2^(15−d) weights exact, lifted from a
  * scalar recurrence to a matrix one. The weights oscillate and decay
  * by |λ(A)| = 1/√2 per day (complex pair — Holt's trend overshoot),
  * so the w = 16 truncation drops ~0.4% of response mass; as in
  * q149, the truncation IS the stated semantics (it is also exactly
  * Holt-from-zero-init for series shorter than w days — the spec's
  * exactness pin). Accumulation is decimal(38,0) — Σ|W|·micro can
  * brush Long range, and the q97 rule is accumulate exact, present
  * double.
  *
  * Scale shape = q149's verbatim: the trailing merge rides
  * [[RangeJoin.pointInInterval]]'s bin rewrite — O(|days|·w)
  * candidates per key, never the O(|days|²) band self-join. */
object LinearRecurrence {

  /** Integer Holt lag weights over the 4^w common denominator:
    * (level, trend) — W_l(k), W_b(k) for k = 0..w−1. Exact BigInt
    * matrix powers of 4A applied to 4c, scaled by 4^(w−1−k). */
  def holtWeights(w: Int): (Seq[BigInt], Seq[BigInt]) = {
    require(w >= 1 && w <= 28, s"window $w out of the exact-Long range")
    var v = (BigInt(2), BigInt(1)) // 4c
    val lvl = Seq.newBuilder[BigInt]
    val trd = Seq.newBuilder[BigInt]
    var k = 0
    while (k < w) {
      val scale = BigInt(4).pow(w - 1 - k)
      lvl += v._1 * scale
      trd += v._2 * scale
      // v ← (4A)·v with 4A = [[2, 2], [−1, 3]]
      v = (2 * (v._1 + v._2), -v._1 + 3 * v._2)
      k += 1
    }
    (lvl.result(), trd.result())
  }

  /** Trailing Holt smoother over a daily grain: for each (key, day)
    * row of `daily` — columns (`keyCol`, `dayCol` integer day,
    * `valueCol` micro-unit long — the q149 grain), emit the smoothed
    * level and trend from the w-day truncated impulse response.
    * Output: (key, day, n_obs, level, trend) with level/trend in the
    * original units, rounded to 6 dp from identical exact integers on
    * any engine. */
  def holtSmooth(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String,
      w: Int = 16): DataFrame = {
    val (lvl, trd) = holtWeights(w)
    val lvlArr = array(lvl.map(b => lit(b.toLong)): _*)
    val trdArr = array(trd.map(b => lit(b.toLong)): _*)
    val denom = math.pow(4.0, w) // 4^w ≤ 2^56 exact in double for w ≤ 28

    val r = daily.select(
      col(keyCol), col(dayCol).cast("long").as("r_day"),
      col(valueCol).as("r_micro"))
    val itv = daily.select(col(keyCol), col(dayCol).cast("long").as("day"),
      (col(dayCol) - (w - 1)).cast("long").as("lo_day"),
      col(dayCol).cast("long").as("hi_day"))
    RangeJoin.pointInInterval(
        r, itv, pointCol = "r_day", loCol = "lo_day", hiCol = "hi_day",
        binWidth = w.toLong, extraKeys = Seq(keyCol))
      .withColumn("__lag", (col("hi_day") - col("r_day")).cast("int"))
      .groupBy(col(keyCol), col("day"))
      .agg(
        count(lit(1)).as("n_obs"),
        sum(element_at(lvlArr, col("__lag") + 1).cast("decimal(20,0)") *
          col("r_micro")).as("__nl"),
        sum(element_at(trdArr, col("__lag") + 1).cast("decimal(20,0)") *
          col("r_micro")).as("__nt"))
      .select(col(keyCol), col("day"), col("n_obs"),
        round(col("__nl").cast("double") / denom / 1e6, 6).as("level"),
        round(col("__nt").cast("double") / denom / 1e6, 6).as("trend"))
  }
}
