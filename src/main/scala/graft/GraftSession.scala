package graft

import org.apache.spark.sql.SparkSession

/** Tuned local SparkSession factory for tests and ad-hoc runs.
  *
  * The same conf keys are what we'd set cluster-side: AQE on (runtime
  * re-planning, skew-join splitting, partition coalescing), modest
  * shuffle parallelism for local mode, UTC session time.
  */
object GraftSession {
  def local(threads: Int = 32): SparkSession =
    build(s"local[$threads]", threads)

  /** The single tuned builder every graft entry point (tests, Verify,
    * Bench, demos) goes through — one place for the parity-critical
    * flags (UTC, nanosAsLong) and the scale posture (AQE + skew join),
    * so a future required config cannot silently diverge between the
    * verified and the benchmarked session. */
  def build(master: String, shufflePartitions: Int): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      // the full extension surface (functions + optimizer rules), the
      // same path an embedding application gets via
      // spark.sql.extensions=graft.functions.GraftExtensions
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
