package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting is the plan-level tool for the pathological ones (a
  * single asset holding half the transfers, the empty-string wallet,
  * etc.): the skewed side gets a deterministic salt derived from its
  * non-key columns, the other side is replicated `salts` times, and
  * the join key becomes (keys..., salt) — one hot partition turns
  * into `salts` even ones. Replication multiplies the small side's
  * shuffle volume by `salts`, so size it to the skew ratio, not
  * higher.
  */
object Salting {

  /** Inner equi-join with the left (skewed, large) side salted and
    * the right (small) side replicated. Result equals
    * `left.join(right, keys)` row-for-row. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int): DataFrame = {
    val nonKey: Seq[Column] = left.columns.filterNot(keys.contains).map(col).toSeq
    val saltedLeft = left.withColumn(
      "__salt",
      pmod(xxhash64(nonKey: _*), lit(salts)).cast("int"))
    val replicatedRight = right.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft
      .join(replicatedRight, keys :+ "__salt")
      .drop("__salt")
  }
}
