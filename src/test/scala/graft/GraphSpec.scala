package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Multi-source BFS: hand-built graphs pin the semantics, then the
  * registry query is checked against a driver-side re-derivation. */
class GraphSpec extends SparkSpec {

  private def dists(edges: Seq[(String, String)], seeds: Seq[String], maxHops: Int) = {
    import spark.implicits._
    GraphOps.hopDistances(
      edges.toDF("src", "dst"), seeds.toDF("node"), maxHops)
      .as[(String, Int)].collect().toMap
  }

  test("path graph: levels, the hop bound, and first-reach minimality") {
    val path = Seq("a" -> "b", "b" -> "c", "c" -> "d")
    assert(dists(path, Seq("a"), 2) == Map("a" -> 0, "b" -> 1, "c" -> 2),
      "maxHops must truncate the frontier")
    assert(dists(path, Seq("a"), 10) ==
      Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3))
    // two seeds: every node takes its NEAREST seed's distance
    assert(dists(path, Seq("a", "d"), 10) ==
      Map("a" -> 0, "d" -> 0, "b" -> 1, "c" -> 1))
  }

  test("cycles terminate by frontier drain, disconnected nodes stay absent") {
    val triangle = Seq("a" -> "b", "b" -> "c", "c" -> "a", "x" -> "y")
    // maxHops far above the diameter: the drain check must stop the
    // loop (an unbounded recursion over the cycle would spin)
    val d = dists(triangle, Seq("a"), 1000)
    assert(d == Map("a" -> 0, "b" -> 1, "c" -> 1),
      s"cycle handling wrong: $d")
    // isolated seed: present at 0 even with no edges touching it
    assert(dists(triangle, Seq("z"), 5) == Map("z" -> 0))
  }

  test("q83 equals a driver-side BFS over the same derived graph") {
    import spark.implicits._
    val got = SparkEntry.queries("q83_graph_distance")(spark, SfDir)
      .as[(String, Int)].collect().toMap

    val edges = Tables.orders(spark, SfDir)
      .join(Tables.lineitem(spark, SfDir),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c:"), col("o_custkey")).as("a"),
        concat(lit("s:"), col("l_suppkey")).as("b"))
      .as[(String, String)].collect()
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val seeds = Tables.customer(spark, SfDir)
      .where(col("c_custkey") % 50 === 0)
      .select(concat(lit("c:"), col("c_custkey")))
      .as[String].collect().toSet

    var want = seeds.map(_ -> 0).toMap
    var frontier = seeds
    (1 to 4).foreach { h =>
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- want.keySet
      want ++= frontier.map(_ -> h)
    }
    assert(got == want, s"q83 diverges from the reference BFS: " +
      s"extra=${got.toSet -- want.toSet} missing=${want.toSet -- got.toSet}")
    assert(got.valuesIterator.max >= 2, "fixture degenerate: no multi-hop node")
  }

  private def ranks(edges: Seq[(String, String)], iterations: Int,
      scale: Long = 100L) = {
    import spark.implicits._
    GraphOps.pageRank(edges.toDF("src", "dst"), iterations, scale)
      .as[(String, Long)].collect().toMap
  }

  test("fixed-point pagerank: hand-computed path graph, exact bits") {
    // a–b–c at scale 100, damping 85, teleport 15; worked by hand:
    //   r0 = 100,100,100
    //   r1: a,c = 15 + (50·85) div 100 = 57; b = 15 + (200·85) div 100 = 185
    //   r2: a,c = 15 + ((185 div 2)·85) div 100 = 93
    //       b   = 15 + ((57+57)·85)     div 100 = 111
    val path = Seq("a" -> "b", "b" -> "c")
    assert(ranks(path, 1) == Map("a" -> 57L, "b" -> 185L, "c" -> 57L))
    assert(ranks(path, 2) == Map("a" -> 93L, "b" -> 111L, "c" -> 93L))
  }

  test("pagerank structure: hubs outrank leaves, symmetry gives equal bits") {
    val star = Seq("h" -> "l1", "h" -> "l2", "h" -> "l3", "h" -> "l4")
    val r = ranks(star, 3, scale = 1000000L)
    val leaves = Seq("l1", "l2", "l3", "l4").map(r)
    assert(leaves.distinct.size == 1, s"symmetric leaves must tie exactly: $r")
    assert(r("h") > leaves.head, s"hub must outrank leaves: $r")
    // total mass never exceeds the initial n·scale (damping only
    // redistributes; teleport restores at most what damping removed)
    assert(r.values.sum <= 5 * 1000000L)
  }

  test("pagerank determinism: partition count does not change the bits") {
    import spark.implicits._
    val edges = (1 to 40).map(i => (s"n${i % 7}", s"n${(i * 3) % 11}"))
      .filter { case (a, b) => a != b }
    val one = GraphOps.pageRank(edges.toDF("src", "dst").repartition(1), 3)
      .as[(String, Long)].collect().toMap
    val many = GraphOps.pageRank(edges.toDF("src", "dst").repartition(13), 3)
      .as[(String, Long)].collect().toMap
    assert(one == many, "fixed-point ranks must be partition-invariant")
  }

  test("pagerank guards: overflow and scale validation fail fast") {
    import spark.implicits._
    val df = Seq("a" -> "b").toDF("src", "dst")
    intercept[IllegalArgumentException] {
      GraphOps.pageRank(df, 1, scale = 101) // not a multiple of 100
    }
    intercept[IllegalArgumentException] {
      // 2 nodes · 4e18 · 85 ≫ Long.MaxValue
      GraphOps.pageRank(df, 1, scale = 4000000000000000000L)
    }
  }

  test("q84 equals a driver-side fixed-point recurrence at sf0.001") {
    import spark.implicits._
    val got = SparkEntry.queries("q84_pagerank")(spark, SfDir)
      .as[(String, Long)].collect().toMap

    val edges = Tables.orders(spark, SfDir)
      .join(Tables.lineitem(spark, SfDir),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c:"), col("o_custkey")).as("a"),
        concat(lit("s:"), col("l_suppkey")).as("b"))
      .as[(String, String)].collect().toSet
    val und = edges ++ edges.map(_.swap)
    val adj = und.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val deg = adj.map { case (k, vs) => k -> vs.size.toLong }

    val scale = 1000000000000L
    var r = deg.map { case (k, _) => k -> scale }
    (1 to 4).foreach { _ =>
      val contrib = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      r.foreach { case (u, ru) =>
        val c = ru / deg(u)
        adj(u).foreach(v => contrib(v) += c)
      }
      r = deg.map { case (k, _) =>
        k -> (scale / 100 * 15 + contrib(k) * 85 / 100)
      }
    }
    assert(got == r, s"q84 diverges from the reference recurrence: " +
      s"sample extra=${(got.toSet -- r.toSet).take(3)} " +
      s"missing=${(r.toSet -- got.toSet).take(3)}")
  }

  private def triCounts(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    GraphOps.triangleCounts(edges.toDF("src", "dst"))
      .as[(Long, Long, Long)].collect()
      .map { case (n, d, t) => n -> (d, t) }.toMap
  }

  test("triangleCounts: K4, pendant, duplicates/reversals/self-loops, hub-without-closure") {
    // K4 (4 triangles, every node in 3) + pendant 5–1 + noise:
    // duplicate edge, reversed duplicate, self-loop
    val k4 = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val noisy = k4 ++ Seq(2L -> 1L, 1L -> 2L, 3L -> 3L, 5L -> 1L)
    assert(triCounts(noisy) == Map(
      1L -> (4L, 3L), 2L -> (3L, 3L), 3L -> (3L, 3L), 4L -> (3L, 3L),
      5L -> (1L, 0L)))
    // a star has wedges but no triangles — the closing join must gate
    val star = Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 0L -> 4L)
    assert(triCounts(star).values.forall(_._2 == 0L))
    // one closing edge → exactly one triangle, counted once
    assert(triCounts(star :+ (1L -> 2L)) == Map(
      0L -> (4L, 1L), 1L -> (2L, 1L), 2L -> (2L, 1L),
      3L -> (1L, 0L), 4L -> (1L, 0L)))
  }

  test("triangleCounts: seeded random graph matches brute-force enumeration") {
    val rnd = new scala.util.Random(42)
    val n = 14
    val edges = (for {
      a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.35
    } yield (a, b)).toSeq
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val want = (for {
      a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
      if adj.getOrElse(a, Set()).contains(b) &&
        adj.getOrElse(b, Set()).contains(c) &&
        adj.getOrElse(a, Set()).contains(c)
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val got = triCounts(edges)
    assert(got.keySet == adj.keySet)
    got.foreach { case (node, (d, t)) =>
      assert(d == adj(node).size.toLong && t == want.getOrElse(node, 0L),
        s"node $node: got (deg=$d, tri=$t), want " +
          s"(${adj(node).size}, ${want.getOrElse(node, 0L)})")
    }
  }
}
