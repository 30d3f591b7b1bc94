package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    // warmup: JIT + classloading + parquet footer caches, untimed
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // the warmup materialized q10/q17/q32's persisted intermediates —
    // release them so the FIRST timed run is as cold as the rest
    CacheScope.releaseAll(spark): Unit
    // min of two timed runs per query: local[32] scheduling/GC noise
    // swings single runs by ±50% on the heavy similarity queries
    // a throwing query records -1 (failure marker), never a fast time
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -1.0 }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val a = timeOnce(fn)
      // release BETWEEN runs too: queries that persist an intermediate
      // (q10/q17/q32) would otherwise serve run b from run a's cache
      // and report the warm-read time as the query
      CacheScope.releaseAll(spark): Unit
      val b = timeOnce(fn)
      CacheScope.releaseAll(spark): Unit
      val best = if (a < 0 || b < 0) -1.0 else math.min(a, b)
      // heavy tail gets a THIRD sample: local[32] scheduling/GC noise
      // swings multi-second iterative queries the most, and min-of-2
      // leaves them the least-converged numbers in the report (the
      // extra run costs seconds only where seconds already dominate)
      val samples = collection.mutable.ArrayBuffer(a, b)
      val settled = if (best > 2.0) {
        val c = timeOnce(fn)
        CacheScope.releaseAll(spark): Unit
        samples += c
        if (c < 0) best else math.min(best, c)
      } else best
      // per-query sample spread (max − min of the valid samples):
      // lets a reader separate code regressions from scheduler noise
      // without re-running — a delta smaller than the spread is noise
      val valid = samples.filter(_ >= 0)
      val spread = if (valid.isEmpty) -1.0 else valid.max - valid.min
      name -> ((settled, spread))
    }
    // the stdout contract line must survive the driver's bounded tail
    // capture: r12 showed it keeps only the LAST 2000 chars, and the
    // full 197-entry short-key dict (~2.8 KB) lost its head →
    // parsed:null. The per-query dict is therefore BUDGETED: entries
    // sorted by time DESC (the informative tail) are added while the
    // dict stays under 1500 chars, so total + sf + the heaviest ~100
    // queries always parse; the full-name, full-precision timings +
    // spreads go to the sidecar file that nothing truncates.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def shortKey(k: String): String = k.takeWhile(_ != '_')
    val entries = results.toSeq.sortBy { case (_, (v, _)) => -v }
      .map { case (k, (v, _)) => "\"" + shortKey(k) + "\":" + f3(v) }
    val budgeted = scala.collection.mutable.ArrayBuffer.empty[String]
    var dictLen = 2 // braces
    for (e <- entries if dictLen + e.length + 1 <= 1500) {
      budgeted += e; dictLen += e.length + 1
    }
    val qs = budgeted.mkString("{", ",", "}")
    // failures (-1 markers) stay visible per-query but must not
    // subtract from (or fake-improve) the headline total
    val total = results.values.map(_._1).filter(_ >= 0).sum
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1)).getOrElse("0")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":$sfNum}""")
    val full = results.map { case (k, (v, sp)) =>
      s""""$k":{"sec":$v,"spread":$sp}""" }.mkString("{", ",", "}")
    val out = java.nio.file.Paths.get("tools/bench_full_latest.json")
    Option(out.getParent).foreach(p => java.nio.file.Files.createDirectories(p): Unit)
    java.nio.file.Files.writeString(out,
      s"""{"total":$total,"sf":"$sfDir","queries":$full}\n"""): Unit
    spark.stop()
  }
}
