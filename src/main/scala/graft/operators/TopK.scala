package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Heavy hitters: who dominates each group.
  *
  * The reference's whale analytics answer this exactly (whale-bucket
  * counts, top wallets per coin — dreambot_whale_chart.py); at
  * 100 TB the same question splits into two shapes:
  *
  *   - [[exact]]: one hash shuffle to count (key, group) pairs, then
  *     a rank kept ≤ k by the WindowGroupLimit pushdown — no global
  *     sort, no driver materialization. This is the right default
  *     whenever the DISTINCT KEY universe per group fits a shuffle,
  *     which at 100 TB it usually still does (counts compress the
  *     fact table by orders of magnitude before the window runs).
  *   - [[countMinEstimates]]: the sketch form for when even the
  *     distinct-key counts are too wide — a count_min_sketch
  *     aggregate builds fixed-width (eps, confidence) summaries with
  *     map-side partial merge (the same mergeability that makes HLL
  *     the only COUNT(DISTINCT) that survives 100 TB, q56), probed
  *     for a bounded candidate set. Estimates overcount by at most
  *     eps·N with the configured confidence, never undercount.
  *
  * Counting, sketch building, AND probing all stay distributed — the
  * sketch table (one fixed-width sketch per group) is joined against
  * the packed candidate arrays and probed executor-side, so the
  * operator scales with the GROUP universe, not with what fits on
  * the driver.
  */
object TopK {

  /** Exact top-k keys per group by count; ties broken by key for
    * engine-reproducible output. Emits (groupCols*, keyCol, cnt, rk). */
  def exact(df: DataFrame, groupCols: Seq[String], keyCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val counted = df.groupBy((groupCols :+ keyCol).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("cnt").desc, col(keyCol).asc)
    counted
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
  }

  /** Count-min estimates for the exact top-k candidates: emits
    * (groupCol, keyCol, cnt, rk, est_cnt). `est_cnt ≥ cnt` always;
    * `est_cnt ≤ cnt + eps·N(group)` with the configured confidence.
    * The key column must be integral (the sketch hashes longs).
    *
    * Fully distributed: an earlier revision collected one sketch PER
    * GROUP to the driver (eps=0.001 ⇒ ~80 KB each) and rebuilt with
    * `parallelize` — bounded for a 5-event-type demo, a driver OOM
    * the day someone groups by `domain` at corpus scale. Now the
    * sketch table stays on the executors; each group's ≤k candidates
    * are packed into one array row, joined against its sketch (both
    * sides exit their aggregation hash-partitioned on the group, so
    * the join reuses that exchange), and probed by
    * [[graft.functions.CmsProbeAll graft_cms_probe]], which
    * deserializes the sketch once per group. Nothing wider than a
    * plan ever reaches the driver. */
  def countMinEstimates(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      k: Int,
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val candidates = exact(df, Seq(groupCol), keyCol, k)
    val sketches = df.groupBy(groupCol)
      .agg(count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed))
        .as("cms"))
    val packed = candidates
      .groupBy(groupCol)
      .agg(collect_list(struct(col("rk"), col(keyCol), col("cnt"))).as("cands"))
    packed.join(sketches, Seq(groupCol))
      .withColumn("ests",
        expr(s"graft_cms_probe(cms, transform(cands, c -> c.`$keyCol`))"))
      .select(col(groupCol), explode(arrays_zip(col("cands"), col("ests"))).as("z"))
      .select(col(groupCol),
        col(s"z.cands.`$keyCol`").as(keyCol),
        col("z.cands.cnt").as("cnt"),
        col("z.cands.rk").as("rk"),
        col("z.ests").as("est_cnt"))
  }

  /** Reciprocal-rank fusion (Cormack et al.) of ranked lists — the
    * standard hybrid-retrieval merge: each leg (a named (id, rank)
    * frame — lexical BM25, vector kNN, …) contributes
    * `1/(k0 + rank)` to every id it ranked, and ids are re-ranked by
    * the summed score. Rank-based, so the legs' incomparable score
    * scales never need calibrating — the reason RRF is the default
    * fusion in every hybrid search stack.
    *
    * Determinism (the oracle contract): each reciprocal term is
    * rounded to 9 dp and summed as DECIMAL(18,9) — the fusion order
    * never touches the total — and the final cut orders by (exact
    * decimal score DESC, id). Output carries `rank_<leg>` columns
    * (null where a leg did not rank the id) plus the presented
    * double `rrf`.
    *
    * Scale: legs are top-k lists (k·|legs| rows total), so the
    * union/group/cut is driver-trivial at any corpus size — the
    * expensive part is producing the legs, not fusing them. */
  def rrfFuse(
      legs: Seq[(String, DataFrame)],
      idCol: String,
      rankCol: String,
      k0: Int = 60,
      topK: Int = 20): DataFrame = {
    require(legs.nonEmpty, "no legs to fuse")
    require(k0 > 0 && topK > 0, "k0 and topK must be positive")
    val names = legs.map(_._1)
    require(names.distinct == names, s"duplicate leg names: $names")
    val tagged = legs.map { case (nm, df) =>
      df.select(col(idCol), lit(nm).as("__leg"),
        col(rankCol).cast("long").as("__rank"))
    }.reduce(_ unionByName _)
    val rankCols = names.map(nm =>
      min(when(col("__leg") === nm, col("__rank"))).as(s"rank_$nm"))
    val score = sum(round(lit(1.0d) / (lit(k0) + col("__rank")), 9)
      .cast("decimal(18,9)")).as("__s")
    tagged.groupBy(col(idCol))
      .agg(rankCols.head, (rankCols.tail :+ score): _*)
      .orderBy(col("__s").desc, col(idCol))
      .limit(topK)
      .select(col(idCol) +: names.map(nm => col(s"rank_$nm")) :+
        round(col("__s").cast("double"), 6).as("rrf"): _*)
  }
}
