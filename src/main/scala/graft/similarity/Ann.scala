package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Dot products / norms are `zip_with` + `aggregate` higher-order
  * functions — pure Catalyst expressions, fully codegen'd, no UDF.
  * Float32 inputs are widened to double before summation so the
  * result is reproducible and oracle-comparable at 6 decimals.
  *
  * `bruteForceKnn` is the O(n²) correctness baseline (the small side
  * broadcasts, so it is a single broadcast-nested-loop stage);
  * `lshKnn` is the scale path: random-hyperplane bucketing turns the
  * cross join into an equi-join on the bucket id, the same structure
  * a 100 TB ANN pass uses (bucket = shuffle key, per-bucket
  * brute-force refinement).
  */
object Ann {

  /** Elementwise dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def prepared(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb
      .select(col(idCol), transform(col(vecCol), x => x.cast("double")).as("__e"))
      .withColumn("__norm", sqrt(aggregate(
        transform(col("__e"), x => x * x), lit(0.0), (acc, x) => acc + x)))

  /** Exact cosine top-k per vector via doc×doc comparison.
    * Correctness baseline + small-collection path; at scale use
    * [[lshKnn]]. Ranking is on the ROUNDED cosine with the neighbor
    * id as tiebreak so results are deterministic across engines. */
  def bruteForceKnn(emb: DataFrame, idCol: String, vecCol: String, k: Int = 5): DataFrame = {
    val e = prepared(emb, idCol, vecCol)
    val a = e.select(col(idCol).as("vec_id"), col("__e").as("__ea"), col("__norm").as("__na"))
    val b = e.select(col(idCol).as("neighbor_id"), col("__e").as("__eb"), col("__norm").as("__nb"))
    val pairs = a
      .join(broadcast(b), col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(dot(col("__ea"), col("__eb")) / (col("__na") * col("__nb")), 6))
    val w = Window.partitionBy("vec_id").orderBy(col("cosine").desc, col("neighbor_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("vec_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (undirected, id_a < id_b).
    * Threshold applies to the rounded cosine so the DuckDB oracle
    * agrees at the boundary. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val e = prepared(emb, idCol, vecCol)
    val a = e.select(col(idCol).as("vec_a"), col("__e").as("__ea"), col("__norm").as("__na"))
    val b = e.select(col(idCol).as("vec_b"), col("__e").as("__eb"), col("__norm").as("__nb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("cosine", round(dot(col("__ea"), col("__eb")) / (col("__na") * col("__nb")), 6))
      .where(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }

  /** Random-hyperplane LSH top-k: bucket = sign bits of `numPlanes`
    * hyperplane projections; candidates share a bucket; exact cosine
    * ranks within the bucket. Planes are generated driver-side from a
    * fixed seed (tiny constant arrays, broadcast into the plan).
    *
    * Approximate by construction → rows-only check, no SQL oracle.
    */
  def lshKnn(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      numPlanes: Int = 6,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val planes: Seq[Column] =
      Seq.fill(numPlanes)(array(Seq.fill(dim)(lit(rnd.nextGaussian())): _*))
    val bucket = (0 until numPlanes)
      .map(i => when(dot(col("__e"), planes(i)) >= 0, 1 << i).otherwise(0))
      .reduce(_ + _)

    val e = prepared(emb, idCol, vecCol).withColumn("__bucket", bucket)
    val a = e.select(col(idCol).as("vec_id"), col("__bucket"), col("__e").as("__ea"), col("__norm").as("__na"))
    val b = e.select(col(idCol).as("neighbor_id"), col("__bucket"), col("__e").as("__eb"), col("__norm").as("__nb"))
    val pairs = a
      .join(b, Seq("__bucket"))
      .where(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(dot(col("__ea"), col("__eb")) / (col("__na") * col("__nb")), 6))
    val w = Window.partitionBy("vec_id").orderBy(col("cosine").desc, col("neighbor_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("vec_id", "neighbor_id", "cosine", "rank")
  }
}
