package graft

import org.apache.spark.sql.functions._

import graft.operators.Splits

/** Planted-fixture coverage for the leakage-free grouped split
  * (q173): group integrity (one group, one split), stability under
  * corpus growth, seed decorrelation, and threshold validation. */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("group integrity: every row of a group gets the group's split") {
    val df = (1L to 200L).map(i => (i, s"grp${i % 17}")).toDF("id", "g")
    val out = Splits.groupedSplit(df, "g")
    assert(out.select("g", "split").distinct().count() == 17,
      "a group must map to exactly one split")
    val labels = out.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("train", "val", "test")))
  }

  test("growth stability: adding groups never moves existing ones") {
    val small = (1L to 50L).map(i => (i, s"grp${i % 5}")).toDF("id", "g")
    val grown = (1L to 200L).map(i => (i, s"grp${i % 23}")).toDF("id", "g")
    val a = Splits.groupedSplit(small, "g")
      .select("g", "split").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val b = Splits.groupedSplit(grown, "g")
      .select("g", "split").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a.forall { case (g, s) => b(g) == s },
      "an old group moved when the corpus grew — resampling behavior")
  }

  test("seeds decorrelate; thresholds validate; fractions move the cut") {
    val df = (1L to 500L).map(i => (i, s"g$i")).toDF("id", "g")
    val s1 = Splits.groupedSplit(df, "g", seed = 1L)
      .where(col("split") === "train").select("g").collect().map(_.getString(0)).toSet
    val s2 = Splits.groupedSplit(df, "g", seed = 2L)
      .where(col("split") === "train").select("g").collect().map(_.getString(0)).toSet
    assert(s1 != s2, "different seeds must pick different train sets")
    // fractions are approximate at the group grain but a 500-group
    // 80% cut cannot plausibly stray past [60%, 95%]
    assert(s1.size > 300 && s1.size < 475, s"train=${s1.size} of 500")
    val half = Splits.groupedSplit(df, "g", permille = (500, 750))
    val counts = half.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("test") > counts.getOrElse("val", 0L) / 2,
      "shrinking train must grow the tail splits")
    intercept[IllegalArgumentException] {
      Splits.groupedSplit(df, "g", permille = (900, 800))
    }
  }
}
