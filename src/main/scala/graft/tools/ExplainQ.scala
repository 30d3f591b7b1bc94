package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev-only plan inspector: print one registry query's formatted
  * physical plan — the `.explain("formatted")` iterate-until-it's-
  * the-plan-you-want loop without pasting query code into a REPL.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.ExplainQ <query> [mode]
  * (mode ∈ simple|extended|formatted|cost, default formatted)
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val mode = if (args.length > 1) args(1) else "formatted"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    SparkEntry.queries(name)(spark, sfDir).explain(mode)
    spark.stop()
  }
}
