package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Derive a k×-scaled benchmark dataset from a driver testdata SF —
  * scaling-slope evidence (PLANS.md) needs a point beyond sf0.1 and
  * the driver data is read-only. Scaling preserves each table's
  * WORKLOAD CHARACTER instead of naively cloning rows:
  *
  *  - events/lineitem/orders: k copies with remapped keys (id·k+c) so
  *    key cardinality grows with volume; dims (assets, customers,
  *    parts) stay fixed — traffic multiplies, the universe doesn't.
  *  - documents: copies get a copy-tag token injected every 4 tokens,
  *    destroying ~half their 3-gram shingles — cross-copy Jaccard
  *    lands far below the 0.8 near-dup threshold, so the pair
  *    workload grows like a real corpus instead of exploding
  *    quadratically in byte-similar clones. The injected tag is
  *    ubiquitous within its copy: exactly the stop-phrase df shape
  *    the maxDf cap exists for, now present at scale.
  *  - embeddings: copies are FRESH pseudo-gaussian vectors
  *    (Irwin–Hall sum of 12 seeded uniform hashes per coordinate), so
  *    the corpus stays isotropic and the ≥τ cosine pair count scales
  *    ~n² the way true random-tail pairs do — not ×k clone pairs at
  *    cosine 1.0.
  *
  * Usage: runMain graft.tools.ScaleUp <baseSfDir> <outDir> <k>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(baseDir, outDir, kStr) = args
    val k = kStr.toInt
    require(k >= 1, "scale factor must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.build(s"local[$cpus]", cpus.toInt)

    def copies(df: DataFrame): DataFrame =
      df.withColumn("__c", explode(array((0 until k).map(i => lit(i)): _*)))
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      write(spark.read.parquet(s"$baseDir/$t.parquet"), t)

    write(
      copies(spark.read.parquet(s"$baseDir/events.parquet"))
        .withColumn("event_id", col("event_id") * k + col("__c"))
        .withColumn("user_id", col("user_id") * k + col("__c"))
        .drop("__c"),
      "events")

    write(
      copies(spark.read.parquet(s"$baseDir/lineitem.parquet"))
        .withColumn("l_orderkey", col("l_orderkey") * k + col("__c"))
        .drop("__c"),
      "lineitem")

    write(
      copies(spark.read.parquet(s"$baseDir/orders.parquet"))
        .withColumn("o_orderkey", col("o_orderkey") * k + col("__c"))
        .drop("__c"),
      "orders")

    write(
      copies(spark.read.parquet(s"$baseDir/documents.parquet"))
        .withColumn("text", when(col("__c") === 0, col("text")).otherwise(
          array_join(flatten(expr(
            "transform(split(text, ' '), (t, i) -> " +
              "IF(i % 4 = 0, array(concat('cp', __c), t), array(t)))")), " ")))
        .withColumn("doc_id", col("doc_id") * k + col("__c"))
        .withColumn("n_chars", length(col("text")))
        .drop("__c"),
      "documents")

    write(
      copies(spark.read.parquet(s"$baseDir/embeddings.parquet"))
        .withColumn("embedding", when(col("__c") === 0, col("embedding")).otherwise(expr(
          """transform(sequence(0, size(embedding) - 1), j ->
            |  cast(aggregate(sequence(1, 12), cast(0.0 as double),
            |    (acc, m) -> acc + pmod(xxhash64(vec_id, __c, j, m), 1048576) / 1048576.0)
            |    - 6.0 as float))""".stripMargin)))
        .withColumn("vec_id", col("vec_id") * k + col("__c"))
        .drop("__c"),
      "embeddings")

    spark.stop()
  }
}
