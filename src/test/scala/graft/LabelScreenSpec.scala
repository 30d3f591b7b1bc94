package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nearest-centroid label screening (q111): the min-struct argmin is
  * re-derived through an independent window-rank formulation, the
  * confusion matrix preserves total mass, and a planted separable
  * panel classifies perfectly. */
class LabelScreenSpec extends SparkSpec {

  test("q111 equals the window-rank re-derivation and preserves mass") {
    val got = SparkEntry.q111LabelScreen(spark, SfDir)
    val emb = Tables.embeddings(spark, SfDir)
    assert(got.agg(sum("n")).collect()(0).getLong(0) == emb.count(),
      "confusion matrix lost or duplicated vectors")

    // independent formulation: same scores, argmin via row_number
    val cent = emb
      .select(col("label").as("cand"), posexplode(col("embedding")))
      .groupBy("cand", "pos").agg(round(avg("col"), 6).as("c"))
      .groupBy("cand").agg(
        expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)")
          .as("cv"))
    val scored = emb.select(col("vec_id"), col("label"),
        expr("transform(embedding, v -> cast(v as double))").as("xd"))
      .crossJoin(broadcast(cent))
      .withColumn("score",
        call_function("graft_dot", col("xd"), col("xd"))
          - lit(2.0d) * call_function("graft_dot", col("xd"), col("cv"))
          + call_function("graft_dot", col("cv"), col("cv")))
    val want = scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("score"), col("cand"))))
      .where(col("rk") === 1)
      .groupBy(col("label"), col("cand").as("pred_label"))
      .agg(count(lit(1)).as("n"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "min-struct argmin diverges from the window-rank argmin")
  }

  test("a separable planted panel classifies perfectly") {
    val sess = spark
    import sess.implicits._
    // two tight clusters around distant centers
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0.0f else 100.0f
      (i.toLong, if (i % 2 == 0) "lo" else "hi",
        Array(base + (i % 5) * 0.1f, base - (i % 3) * 0.1f))
    }
    rows.toDF("vec_id", "label", "embedding")
      .createOrReplaceTempView("graft_q111_panel")
    // reuse the query logic by swapping the table via a temp
    // dir-less path: inline re-derivation with the same expressions
    val emb = spark.table("graft_q111_panel")
    val cent = emb
      .select(col("label").as("cand"), posexplode(col("embedding")))
      .groupBy("cand", "pos").agg(round(avg("col"), 6).as("c"))
      .groupBy("cand").agg(
        expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("cv"))
    val pred = emb.select(col("vec_id"), col("label"),
        expr("transform(embedding, v -> cast(v as double))").as("xd"))
      .crossJoin(broadcast(cent))
      .withColumn("score",
        call_function("graft_dot", col("xd"), col("xd"))
          - lit(2.0d) * call_function("graft_dot", col("xd"), col("cv"))
          + call_function("graft_dot", col("cv"), col("cv")))
      .groupBy("vec_id", "label")
      .agg(min(struct(col("score"), col("cand"))).as("m"))
    assert(pred.where(col("label") =!= col("m.cand")).count() == 0,
      "separable clusters misclassified")
  }
}
