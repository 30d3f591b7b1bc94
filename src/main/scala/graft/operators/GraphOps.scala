package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph traversal as DataFrame rounds.
  *
  * [[graft.similarity.Dedup.keepersFromEdges]] already runs min-label
  * propagation with pointer jumping; this is the other standard
  * iterative shape — multi-source BFS — exposed as an operator. Hop
  * distances are integer-exact, which is what makes an independent
  * oracle possible at all: a fixed-point float computation (PageRank)
  * compounds summation-order drift per iteration, while BFS levels
  * are engine-reproducible and a bounded recursive CTE re-derives
  * them in DuckDB (the q43 oracle pattern).
  *
  * Iterative-plan hygiene, same as the label-propagation loop: every
  * round's frontier and the growing distance table are
  * localCheckpoint'ed — without it the plan nests one join tree per
  * round and round N replays rounds 1..N−1; on a cluster, swap for
  * checkpoint() to reliable storage. The per-round `isEmpty` probe is
  * loop CONTROL, not data movement: it reads one partition's first
  * row at most, and early-stops the loop the moment the frontier
  * drains (graph diameter, not maxHops, bounds the rounds actually
  * run).
  */
object GraphOps {

  /** Minimum hop distance from any seed to every reachable node, over
    * an undirected edge list, bounded at `maxHops`.
    *
    * @param edges (src, dst) pairs; treated as undirected (both
    *   directions are traversed), self-loops and duplicates harmless
    * @param seeds single `node` column; distance 0 rows
    * @return (node, dist) — one row per reached node at its FIRST
    *   (minimal) hop count; unreachable nodes are absent */
  def hopDistances(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    val undirected = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .transform(graft.CacheScope.persisted(_))

    var dist = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0)).localCheckpoint()
    var frontier = dist
    var h = 0
    var drained = false
    while (h < maxHops && !drained) {
      h += 1
      val next = frontier
        .join(undirected, frontier("node") === undirected("src"))
        .select(col("dst").as("node"))
        .distinct()
        .join(dist, Seq("node"), "left_anti") // first reach = min hop
        .withColumn("dist", lit(h))
        .localCheckpoint()
      if (next.isEmpty) drained = true
      else {
        dist = dist.unionByName(next).localCheckpoint()
        frontier = next
      }
    }
    dist
  }
}
