package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-dataset overlap estimation from KMV (k-minimum-values)
  * sketch TABLES — the set-operation cardinality the HLL family
  * cannot answer (HLL unions; it never intersects).
  *
  * The LLM-data question this serves: "how much of corpus B is
  * already in corpus A?" — answered BEFORE paying the exact
  * cross-corpus dedup join. A KMV sketch is the k smallest distinct
  * content hashes of a set; it is a uniform sample of the set's hash
  * space, so (k−1)·SPACE/h_k estimates the distinct count, the k-min
  * of a UNION is derivable from the two sketches alone (k-min of
  * union ⊆ union of k-mins), and within that union sample the
  * fraction of hashes present in BOTH sketches estimates Jaccard —
  * intersection follows as J·|A∪B|. Standard theta-sketch algebra
  * (Beyer et al., "On Synopses for Distinct-Value Estimation"),
  * expressed here the way this repo expresses sketches: as a small
  * TABLE (|sets|·k rows), because a stored table merges, joins, and
  * re-ranks with plain relational operators — no opaque binary state.
  *
  * Everything is DETERMINISTIC and cross-engine: the content hash is
  * the first 15 hex digits of md5(text) read as a 60-bit integer
  * (Spark `conv(_,16,10)`, DuckDB `('0x'||_)::BIGINT`), ranking is
  * integer, and the only non-exact steps are the final estimate
  * divisions — identical IEEE ops in identical order both engines,
  * so the whole pipeline sits under the hash gate (q109), unlike any
  * seeded-sketch design.
  *
  * Scale: the sketch BUILD is one distinct + one per-set top-k over
  * |docs| (WindowGroupLimit pushes the rank); everything pairwise
  * happens on |sets|·k rows — at 100 TB the fact table is touched
  * once, and 190 dataset pairs cost as much as one.
  */
object Overlap {

  /** 2^60 — the hash space of [[contentHash]], exactly representable
    * in a double (and in every engine's BIGINT). */
  val Space: Double = 1152921504606846976.0d

  /** 60-bit content identity: first 15 hex digits of md5, as a long.
    * Uniform over [0, 2^60); cross-engine re-derivable. */
  def contentHash(text: Column): Column =
    conv(substring(md5(text), 1, 15), 16, 10).cast("long")

  /** The KMV sketch table: k smallest DISTINCT content hashes per
    * `setCol` value, with their rank. */
  def kmvTable(docs: DataFrame, setCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    docs
      .select(col(setCol).as("set_id"), contentHash(col(textCol)).as("h"))
      .distinct()
      .withColumn("rk", row_number().over(Window.partitionBy("set_id").orderBy("h")))
      .where(col("rk") <= k)
  }

  /** Per-set distinct-count estimates from the sketch table: exact
    * when the set had fewer than k distinct hashes, (k−1)·SPACE/h_k
    * otherwise. */
  def distinctEstimates(sketch: DataFrame, k: Int): DataFrame =
    sketch.groupBy("set_id")
      .agg(count(lit(1)).as("n"),
        max(when(col("rk") === k, col("h"))).as("hk"))
      .select(col("set_id"),
        round(when(col("n") < k, col("n").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(Space) / col("hk").cast("double")), 6)
          .as("est_distinct"))

  /** Union / Jaccard / intersection estimates for every set pair
    * (set_a < set_b), from the sketch table alone. For each pair the
    * union's k smallest hashes are re-ranked out of the two sketches;
    * membership flags inside that sample are faithful (any union-k
    * hash belonging to set A is ≤ A's own k-th minimum, so it IS in
    * A's sketch). Estimates go exact automatically when the union
    * sample is smaller than k. */
  def pairwiseOverlap(sketch: DataFrame, k: Int): DataFrame = {
    val sets = sketch.select("set_id").distinct()
    val pairs = sets.select(col("set_id").as("set_a"))
      .crossJoin(sets.select(col("set_id").as("set_b")))
      .where(col("set_a") < col("set_b"))
    val fromA = pairs
      .join(sketch.select(col("set_id").as("set_a"), col("h")), Seq("set_a"))
      .select(col("set_a"), col("set_b"), col("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val fromB = pairs
      .join(sketch.select(col("set_id").as("set_b"), col("h")), Seq("set_b"))
      .select(col("set_a"), col("set_b"), col("h"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    val unioned = fromA.unionByName(fromB)
      .groupBy("set_a", "set_b", "h")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
      .withColumn("rk",
        row_number().over(Window.partitionBy("set_a", "set_b").orderBy("h")))
      .where(col("rk") <= k)
    val agg = unioned.groupBy("set_a", "set_b")
      .agg(
        count(lit(1)).as("n_kept"),
        max(when(col("rk") === k, col("h"))).as("hk"),
        sum(col("in_a") * col("in_b")).cast("long").as("n_common"))
    val unionEst = when(col("n_kept") < k, col("n_kept").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(Space) / col("hk").cast("double"))
    val jac = col("n_common").cast("double") / col("n_kept").cast("double")
    agg.select(
      col("set_a"), col("set_b"), col("n_common"),
      round(jac, 6).as("jaccard_est"),
      round(unionEst, 6).as("est_union"),
      round(jac * unionEst, 6).as("est_intersection"))
  }
}
