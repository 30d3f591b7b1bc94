package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.functions.Kll

/** The KLL compactor sketch: exactness below capacity, measured rank
  * error above it, merge/serde laws, then q87's sketch-table windows
  * against exact percentiles. */
class QuantileSketchSpec extends SparkSpec {

  private def rankOf(sorted: Array[Double], v: Double): Double = {
    val i = sorted.count(_ <= v)
    i.toDouble / sorted.length
  }

  test("below capacity the sketch is exact") {
    val s = new Kll.Sketch(64)
    val xs = (1 to 50).map(_.toDouble)
    scala.util.Random.shuffle(xs).foreach(s.insert)
    assert(s.n == 50)
    // with no compaction every value is retained: quantiles are the
    // exact order statistics
    assert(s.quantiles(Array(0.02, 0.5, 1.0)).toSeq == Seq(1.0, 25.0, 50.0))
  }

  test("rank error stays under 2% at k=256 on 50k skewed values") {
    val s = new Kll.Sketch(256)
    // deterministic, heavily skewed (exp-ish) and non-monotone order
    val xs = Array.tabulate(50000) { i =>
      val u = ((i * 2654435761L) % 50000).toDouble / 50000
      math.pow(u, 4) * 1000.0
    }
    xs.foreach(s.insert)
    assert(s.n == 50000, "weight must be preserved through compaction")
    val sorted = xs.sorted
    val ps = Array(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)
    val qs = s.quantiles(ps)
    ps.zip(qs).foreach { case (p, q) =>
      val err = math.abs(rankOf(sorted, q) - p)
      assert(err <= 0.02, s"p=$p: estimate $q has rank error $err")
    }
  }

  test("merging chunk sketches preserves weight and the error bound") {
    val xs = Array.tabulate(40000)(i =>
      (((i * 40503L) % 40000) - 20000).toDouble)
    val whole = new Kll.Sketch(256)
    xs.foreach(whole.insert)
    val merged = new Kll.Sketch(0) // merge buffer adopts k
    xs.grouped(7000).foreach { chunk =>
      val part = new Kll.Sketch(256)
      chunk.foreach(part.insert)
      merged.mergeIn(part)
    }
    assert(merged.n == 40000 && merged.k == 256)
    val sorted = xs.sorted
    Array(0.1, 0.5, 0.9).foreach { p =>
      val err = math.abs(rankOf(sorted, merged.quantiles(Array(p))(0)) - p)
      assert(err <= 0.02, s"merged sketch p=$p rank error $err")
    }
    // mismatched k is a hard error, not silent degradation
    intercept[IllegalArgumentException] {
      merged.mergeIn({ val o = new Kll.Sketch(64); o.insert(1.0); o })
    }
  }

  test("serialization round-trips bytes and behavior") {
    val s = new Kll.Sketch(32)
    (1 to 1000).foreach(i => s.insert(math.sin(i) * i))
    val bytes = Kll.serialize(s)
    val back = Kll.deserialize(bytes)
    assert(back.k == s.k && back.n == s.n)
    assert(Kll.serialize(back).toSeq == bytes.toSeq)
    assert(back.quantiles(Array(0.3, 0.7)).toSeq ==
      s.quantiles(Array(0.3, 0.7)).toSeq)
  }

  test("the aggregate path equals the direct path, deterministically") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val xs = Array.tabulate(30000)(i => ((i * 48271L) % 30000).toDouble)
    // single partition -> one deterministic insert order -> the agg
    // must produce byte-identical results across runs
    val df = xs.toSeq.toDF("v").coalesce(1)
    def run() = df.agg(
      expr("graft_kll_quantiles(graft_kll_agg(v, 256), array(0.5d))"))
      .head.getSeq[Double](0).head
    val a = run()
    assert(run() == a, "same plan, same bytes in, different estimate out")
    val sorted = xs.sorted
    assert(math.abs(rankOf(sorted, a) - 0.5) <= 0.02)
  }

  test("q87 sketch-table windows track exact trailing percentiles") {
    import spark.implicits._
    val got = SparkEntry.queries("q87_percentile_sketch")(spark, SfDir)
      .as[(Date, Double, Double)].collect()
      .map { case (d, p50, p95) => d -> (p50, p95) }.toMap

    val pairs = Tables.events(spark, SfDir)
      .select(to_date(col("ts")).as("day"), col("value"))
      .as[(Date, Double)].collect()
    got.foreach { case (day, (p50, p95)) =>
      val lo = Date.valueOf(day.toLocalDate.minusDays(6))
      val window = pairs.collect {
        case (d, v) if !d.before(lo) && !d.after(day) => v
      }.sorted
      assert(window.nonEmpty, s"day $day has an empty window")
      // estimates must be REAL window values at roughly the right
      // rank (loose 5%: small windows at sf0.001 quantize coarsely)
      Seq(0.5 -> p50, 0.95 -> p95).foreach { case (p, est) =>
        assert(window.contains(est),
          s"day $day p=$p: $est is not a window value")
        assert(math.abs(rankOf(window, est) - p) <= 0.05,
          s"day $day p=$p: estimate $est rank ${rankOf(window, est)}")
      }
    }
  }
}
