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

  /** Undirected edge set from a (src, dst) list: canonicalize each
    * pair to (least, greatest) BEFORE the dedupe, then re-emit both
    * directions narrowly (explode — no second shuffle). The naive
    * union-then-distinct order shuffles every edge twice (both
    * directions flow through the distinct); this shuffles each
    * undirected edge once. Self-loops survive as a single row. */
  private def symmetrize(edges: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .distinct()
    canon.select(explode(when(col("lo") === col("hi"),
        array(struct(col("lo").as("src"), col("hi").as("dst"))))
      .otherwise(array(
        struct(col("lo").as("src"), col("hi").as("dst")),
        struct(col("hi").as("src"), col("lo").as("dst"))))).as("e"))
      .select(col("e.src"), col("e.dst"))
  }

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
    val undirected = symmetrize(edges)
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

  /** Deterministic fixed-point PageRank over an undirected edge list.
    *
    * The scaladoc above says a float PageRank cannot be independently
    * oracled — summation-order drift compounds per iteration. This
    * variant removes the float: ranks are scaled Longs and every step
    * is integer arithmetic (`div` truncation), so addition is exact
    * and commutative and the result is ENGINE-REPRODUCIBLE — the same
    * bits from Spark at any partition count and from a SQL engine
    * re-deriving the recurrence (q84's chained-CTE oracle). That is
    * the same reproducibility posture as the stratified sampler's
    * pure-hash predicate: at 100 TB you cannot eyeball a diff, so the
    * spec IS the bit pattern.
    *
    * Recurrence, all in Long (mirrored literally by the oracle SQL):
    * {{{
    *   r0(v)   = scale
    *   c_i(v)  = Σ_{u ~ v} r_i(u) div deg(u)
    *   r_{i+1}(v) = scale·(100−dampingPct) div 100
    *                + (c_i(v) · dampingPct) div 100
    * }}}
    * Truncation loses < 1 unit per div — at scale 10¹² that is a
    * relative error ~10⁻¹², far below anything a ranking consumer
    * can observe, and (unlike float rounding) it is the SAME loss in
    * every engine.
    *
    * Overflow is guarded, not hoped away: total mass is ≤ n·scale
    * (teleport adds at most what damping removed), so the largest
    * intermediate is maxContrib·dampingPct ≤ n·scale·dampingPct,
    * checked against Long.MaxValue after counting nodes (one scalar
    * driver action on a table the loop needs anyway). For a larger
    * corpus pick a smaller scale: precision degrades gracefully,
    * overflow would throw (ANSI) mid-job.
    *
    * Same iterative-plan hygiene as [[hopDistances]]: each round's
    * rank table is localCheckpoint'ed so round N does not replay
    * rounds 1..N−1; the symmetrized edge and degree tables are
    * persisted once via [[graft.CacheScope]] and re-read per round.
    *
    * @param edges (src, dst) pairs; symmetrized, deduplicated
    * @param iterations fixed round count (fixed, not convergence-
    *   tested: a data-dependent stop would make the output depend on
    *   a float tolerance — the thing this variant exists to avoid)
    * @param scale fixed-point unit (rank 1.0 ≡ `scale`); must divide
    *   by 100 exactly so the teleport term is exact
    * @return (node, rank_fp) — rank in `scale` units */
  def pageRank(
      edges: DataFrame,
      iterations: Int,
      scale: Long = 1000000000000L,
      dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(scale >= 100 && scale % 100 == 0,
      s"scale must be a positive multiple of 100, got $scale")
    require(dampingPct >= 1 && dampingPct <= 99,
      s"dampingPct must be in [1,99], got $dampingPct")
    // shuffle economics: the edge table is the big thing here, and a
    // naive loop re-shuffles it per round (rank⋈deg, ⋈edges,
    // groupBy). Instead the degree is pre-joined ONCE into an
    // explicitly src-partitioned persisted edge table — distinct()
    // leaves the table hash-partitioned on (src, dst), which does NOT
    // satisfy a src-keyed join, so without the repartition every
    // round re-exchanges the edges (measured: it is most of the
    // query's shuffle mass). With it, each round's rank⋈edges join
    // lines up for free (rank exits its groupBy hash-partitioned on
    // node = src; localCheckpoint preserves the partitioning),
    // leaving ONE shuffle per round — the per-dst contribution
    // rollup, map-side-combined down to at-most nodes×mappers rows.
    // tools.CostAudit, q84 at sf0.1: 108 MB naive → 52 MB with the
    // canonical-pair symmetrize, the static edge partitioning, and
    // data-sized edge partitions — the residue is the one-time edge
    // build plus the per-round partial-agg floor.
    val und = symmetrize(edges)
    val deg = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d"))
      .transform(graft.CacheScope.persisted(_))
    val nNodes = deg.count() // also warms the persisted deg
    // edge partition count sized to the DATA, not the session
    // default: the per-round rollup's map-side partial emits up to
    // (nodes × mappers) rows, so over-parallel edge partitions
    // inflate the one remaining shuffle linearly in the mapper count.
    // ~1.5M edges/partition keeps partitions comfortably in memory
    // while holding the partial-agg term near the nodes floor. The
    // edge count is Σdeg over the already-persisted degree table —
    // no extra pass over the edges.
    val nEdges = deg.agg(sum("d")).head.getLong(0)
    val edgeParts = math.max(
      math.min(8, edges.sparkSession.sparkContext.defaultParallelism),
      math.ceil(nEdges / 1500000.0).toInt)
    val undDeg = und.join(deg, und("src") === deg("node"))
      .select(col("src"), col("dst"), col("d"))
      .repartition(edgeParts, col("src"))
      .transform(graft.CacheScope.persisted(_))
    require(
      BigInt(nNodes) * scale * dampingPct <= BigInt(Long.MaxValue),
      s"n·scale·damping would overflow Long ($nNodes nodes at scale $scale); " +
        "pick a smaller scale for this corpus")

    val teleport = scale / 100 * (100 - dampingPct)
    var rank = deg.select(col("node"), lit(scale).as("r")).localCheckpoint()
    var i = 0
    while (i < iterations) {
      i += 1
      val contribs = undDeg.join(rank, undDeg("src") === rank("node"))
        .select(col("dst").as("node"), expr("r div d").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      // every node of an undirected graph has a neighbor, so the left
      // join never actually nulls here — it is the shape a DIRECTED
      // caller would need (sinks receive nothing), kept so the
      // operator and its oracle state the same recurrence
      rank = deg.select(col("node"))
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr(s"(coalesce(s, 0L) * $dampingPct) div 100")).as("r"))
        .localCheckpoint()
    }
    rank.select(col("node"), col("r").as("rank_fp"))
  }

  /** Exact per-node triangle counts over an undirected edge list —
    * the third classic graph shape next to BFS ([[hopDistances]]) and
    * PageRank ([[pageRank]]), and like BFS it is integer-exact, so an
    * independent engine re-derives it verbatim (the DuckDB oracle is
    * the literal three-way self-join).
    *
    * Degree-ordered orientation (the Ortmann–Brandes / MR-standard
    * compact-forward scheme): each canonical edge is directed from
    * its lower endpoint to its higher endpoint under the total order
    * (degree, id). Every triangle then materializes EXACTLY ONCE — as
    * a wedge centered at its ≺-minimal vertex whose closing pair
    * (v, w) appears in the oriented set in one direction only — so no
    * distinct/dedupe shuffle is ever needed. The orientation is also
    * the scale bound: a hub's edges all point INTO it, so wedge
    * fan-out per node is capped by its out-degree ≤ O(√m), and total
    * wedge work is O(m^{3/2}) instead of Σdeg² (which a skewed degree
    * distribution turns quadratic). Plan: one distinct shuffle
    * (canonical edges), one degree aggregation, two equi-joins to
    * attach degrees, then the wedge join on the center node and the
    * closing-edge join on the (v, w) pair — every join an ordinary
    * hash shuffle on its key, nothing on the driver.
    *
    * @param edges (src, dst) pairs; direction ignored, duplicates and
    *   self-loops dropped
    * @return (node, degree, n_triangles) — one row per node of the
    *   deduplicated graph, n_triangles = triangles containing it */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
      .transform(graft.CacheScope.persisted(_))
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
      .transform(graft.CacheScope.persisted(_))
    val withDeg = canon
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
    // orient lower-(deg,id) → higher; canonical (a,b) already has
    // a < b, so the id tie-break on equal degrees is a ≺ b
    val oriented = withDeg.select(
        when(col("da") < col("db") || (col("da") === col("db")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .transform(graft.CacheScope.persisted(_))
    // wedges at u over ORDERED neighbor pairs (x, y), x ≠ y: of the
    // two orders of a closing pair, exactly one matches the oriented
    // closing edge — the join below IS the dedupe
    val wedges = oriented.select(col("u"), col("v").as("x"))
      .join(oriented.select(col("u"), col("v").as("y")), "u")
      .where(col("x") =!= col("y"))
    val triangles = wedges.join(
      oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
    val perNode = triangles
      .select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
