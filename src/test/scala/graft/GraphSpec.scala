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
}
