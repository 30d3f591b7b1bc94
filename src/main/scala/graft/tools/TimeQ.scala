package graft.tools

import graft.{CacheScope, GraftSession, SparkEntry}

/** Dev-only single-query timer: run one registry query `reps` times
  * (first run = warmup, reported separately) and print per-run
  * seconds — the head-to-head harness for chasing a single query's
  * regression without paying a full Bench sweep (the r7 q19 lesson:
  * cross-run deltas under ~3× are VM noise unless measured same-VM,
  * warmed, back to back).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.TimeQ <query> [reps]
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    val fn = SparkEntry.queries(name)
    val times = (0 to reps).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count(): Unit
      val t = (System.nanoTime() - t0) / 1e9
      CacheScope.releaseAll(spark): Unit
      t
    }
    println(f"TIMEQ $name warmup=${times.head}%.2f " +
      times.tail.map(t => f"$t%.2f").mkString("runs=[", ", ", "]") +
      f" min=${times.tail.min}%.2f")
    spark.stop()
  }
}
