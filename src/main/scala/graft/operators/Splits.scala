package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, leakage-free train/validation/test splitting — the
  * hand-off every training-data pipeline makes and the one a naive
  * `rand() < 0.8` gets wrong twice: random splits are irreproducible
  * across runs, and row-grain splits LEAK — near-identical documents
  * from one source (or one user's events) land on both sides of the
  * train/test wall, inflating eval. The standard fix (e.g. URL-level
  * splits in web-corpus work) assigns whole GROUPS: every row of a
  * group hashes to the same split, so the wall sits between groups.
  *
  * The assignment is pure column arithmetic on the group key — an
  * exact char-polynomial fold (the q25/q170 arithmetic, seeded so
  * disjoint experiments decorrelate) into a permille bucket, compared
  * against cumulative thresholds. No shuffle, no state, no RNG: one
  * codegen-friendly pass, reproducible on any engine (the oracle
  * re-derives every label), stable under corpus growth — adding a new
  * group never moves an old one (the property resampling lacks).
  * Fractions hold at the GROUP grain in expectation; a skewed group
  * skews row counts — that is the leakage-freedom trade, stated.
  */
object Splits {

  private val P = 1000000007L

  /** Exact seeded char-polynomial of the group key (q170's fold),
    * finished with a Knuth multiplicative mix: the bare fold maps
    * consecutive keys ("src1", "src2", …) to CONSECUTIVE residues —
    * a permille cut of that is a range cut, not a split. The multiply
    * is overflow-safe because the fold is already reduced mod p < 2³⁰
    * (the r5 pre-reduce rule), and both engines compute it exactly. */
  def keyHash(key: Column, seed: Long): Column =
    aggregate(split(key.cast("string"), ""), lit(seed % P),
      (acc, c) => (acc * 31L + ascii(c)) % P,
      h => (h * 2654435761L) % P)

  /** Label every row train/val/test by its GROUP's hash bucket.
    * `permille` are cumulative thresholds out of 1000: (800, 900)
    * ⇒ 80% train, 10% val, 10% test at the group grain. */
  def groupedSplit(
      df: DataFrame,
      groupCol: String,
      seed: Long = 7L,
      permille: (Int, Int) = (800, 900)): DataFrame = {
    val (trainUpTo, valUpTo) = permille
    require(0 < trainUpTo && trainUpTo < valUpTo && valUpTo <= 1000,
      s"cumulative permille thresholds out of order: $permille")
    val bucket = pmod(keyHash(col(groupCol), seed), lit(1000L))
    df.withColumn("split",
      when(bucket < trainUpTo, lit("train"))
        .when(bucket < valUpTo, lit("val"))
        .otherwise(lit("test")))
  }
}
