package graft

import org.apache.spark.sql.functions._

import graft.similarity.Overlap

/** KMV overlap sketches (similarity/Overlap.scala): mergeability as
  * EXACT set equality, membership-flag faithfulness, estimator
  * accuracy on planted 50%-overlap corpora, exact-path behavior below
  * k, and the q109 wiring. */
class OverlapSpec extends SparkSpec {

  private val K = 64

  // two synthetic corpora with EXACTLY known overlap: A = texts
  // 0..3999, B = 2000..5999 → |A|=|B|=4000, |A∩B|=2000, |A∪B|=6000
  private def planted = {
    val sess = spark
    import sess.implicits._
    val a = spark.range(0L, 4000L).select(lit("A").as("set_id"),
      concat(lit("doc-"), col("id")).as("text"))
    val b = spark.range(2000L, 6000L).select(lit("B").as("set_id"),
      concat(lit("doc-"), col("id")).as("text"))
    a.unionByName(b)
  }

  test("union sketch derived from two sketches equals the direct union sketch") {
    val sk = Overlap.kmvTable(planted, "set_id", "text", K)
    // direct: sketch the union as ONE set
    val direct = Overlap.kmvTable(
        planted.select(lit("U").as("set_id"), col("text")), "set_id", "text", K)
      .select("h").collect().map(_.getLong(0)).toSet
    // derived: k smallest of the two sketches' hash union
    val derived = sk.select("h").distinct()
      .orderBy("h").limit(K).collect().map(_.getLong(0)).toSet
    assert(derived == direct, "k-min of union is not derivable from the sketches")
  }

  test("membership flags inside the union sample are faithful") {
    val sk = Overlap.kmvTable(planted, "set_id", "text", K)
    val aHashes = sk.where(col("set_id") === "A")
      .select("h").collect().map(_.getLong(0)).toSet
    val exactA = planted.where(col("set_id") === "A")
      .select(Overlap.contentHash(col("text")).as("h"))
      .collect().map(_.getLong(0)).toSet
    // any union-k hash that belongs to set A must be in A's sketch
    val unionK = sk.select("h").distinct().orderBy("h").limit(K)
      .collect().map(_.getLong(0))
    unionK.foreach { h =>
      assert(exactA.contains(h) == aHashes.contains(h),
        s"sketch membership diverges from set membership for $h")
    }
  }

  test("estimates land within KMV error bounds on the planted overlap") {
    val est = Overlap.pairwiseOverlap(
      Overlap.kmvTable(planted, "set_id", "text", K), K).collect()(0)
    val (jac, uni, inter) = (est.getDouble(3), est.getDouble(4), est.getDouble(5))
    // truth: J = 2000/6000 = 0.3333, |A∪B| = 6000, |A∩B| = 2000.
    // k=64 → stderr(J) ≈ sqrt(J(1−J)/k) ≈ 0.059, stderr(|U|)/|U| ≈
    // 1/sqrt(k−2) ≈ 12.7%; assert 3.5σ envelopes
    assert(math.abs(jac - 1.0 / 3.0) < 0.21, s"jaccard_est=$jac")
    assert(math.abs(uni - 6000.0) / 6000.0 < 0.45, s"est_union=$uni")
    assert(inter > 0 && math.abs(inter - 2000.0) / 2000.0 < 0.66,
      s"est_intersection=$inter")
    // distinct estimates for the sets themselves
    val d = Overlap.distinctEstimates(
        Overlap.kmvTable(planted, "set_id", "text", K), K)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(d("A") - 4000.0) / 4000.0 < 0.45, s"est A=${d("A")}")
    assert(math.abs(d("B") - 4000.0) / 4000.0 < 0.45, s"est B=${d("B")}")
  }

  test("below k everything goes exact") {
    val sess = spark
    import sess.implicits._
    val tiny = Seq.tabulate(30)(i => ("A", s"t-$i")) ++
      Seq.tabulate(30)(i => ("B", s"t-${i + 15}"))
    val df = tiny.toDF("set_id", "text")
    val est = Overlap.pairwiseOverlap(
      Overlap.kmvTable(df, "set_id", "text", K), K).collect()(0)
    // |A∪B| = 45 < k → exact union; 15 shared of 45 kept → exact J
    // (output columns are rounded at 1e-6 — compare at that grain)
    assert(est.getLong(2) == 15L)
    assert(math.abs(est.getDouble(3) - 15.0 / 45.0) < 1e-6)
    assert(est.getDouble(4) == 45.0)
    assert(math.abs(est.getDouble(5) - 15.0) < 1e-5)
  }

  test("q109: three dataset pairs, overlapping neighbors detected") {
    val out = SparkEntry.q109KmvOverlap(spark, SfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    // B shares half its sources with each of A and C; A and C are
    // disjoint source ranges (overlap only through the rare planted
    // cross-source duplicate texts)
    assert(out(("A", "B")) > out(("A", "C")),
      s"neighbor overlap not detected: $out")
    assert(out(("B", "C")) > out(("A", "C")))
  }
}
