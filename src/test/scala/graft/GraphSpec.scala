package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** PageRank: differential against an in-memory reference implementation,
  * mass conservation, dangling redistribution, and hub ordering.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference PageRank on Maps — same semantics, driver-side. */
  private def ref(edges: Seq[(Long, Long)], iters: Int,
                  d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val dangle = nodes.filterNot(out.contains).map(r).sum
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = nodes.map(v => v ->
        ((1.0 - d) / n + d * (in.getOrElse(v, 0.0) + dangle / n))).toMap
    }
    r
  }

  // a hub (1 -> everyone), a chain, a dangling sink (5 has no out-edges)
  private val edges = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (3L, 4L), (4L, 1L), (4L, 5L))

  test("pageRank matches the reference implementation on a dangling graph") {
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 5)
      .as[(Long, Double)].collect().toMap
    val want = ref(edges, 5)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-9, s"node $v: $r vs ${want(v)}")
    }
    // mass is conserved (the dangling node's rank is redistributed, not lost)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // 4 receives from the chain AND feeds the cycle: it outranks the sink's
    // upstreams; the dangling sink itself collects only from 4
    assert(got(4L) > got(2L))
  }

  test("pageRank is partitioning-invariant (decimal-accumulated sums)") {
    val a = Graph.pageRank(edges.toDF("src", "dst").repartition(7), iters = 4)
      .as[(Long, Double)].collect().toMap
    val b = Graph.pageRank(edges.toDF("src", "dst").coalesce(1), iters = 4)
      .as[(Long, Double)].collect().toMap
    assert(a == b, "ranks must be bit-identical across partitionings")
  }

  /** Reference PERSONALIZED PageRank — teleport and dangling mass go to
    * the seed set uniformly.
    */
  private def refPpr(edges: Seq[(Long, Long)], seeds: Set[Long], iters: Int,
                     d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val s = seeds.intersect(nodes.toSet)
    def t(v: Long): Double = if (s.contains(v)) 1.0 / s.size else 0.0
    var r = nodes.map(v => v -> t(v)).toMap
    for (_ <- 0 until iters) {
      val dangle = nodes.filterNot(out.contains).map(r).sum
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (x, _) => r(x) / out(x) }.sum).toMap
      r = nodes.map(v => v ->
        ((1.0 - d) * t(v) + d * (in.getOrElse(v, 0.0) + dangle * t(v)))).toMap
    }
    r
  }

  test("personalizedPageRank: seed-restart semantics, differential, refusals (r15)") {
    val seeds = Seq(1L).toDF("node")
    val got = Graph.personalizedPageRank(edges.toDF("src", "dst"), seeds,
      iters = 5).as[(Long, Double)].collect().toMap
    val want = refPpr(edges, Set(1L), 5)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-9, s"node $v: $r vs ${want(v)}")
    }
    // mass conserved (dangling restarts at the seed, never leaks)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // proximity, not importance: the seed's direct neighbors outrank the
    // far side of the chain
    assert(got(2L) > got(5L))
    // the seed holds the most mass (it receives every restart)
    assert(got(1L) == got.values.max)
    // a seed OUTSIDE the graph contributes nothing; all-outside refuses
    val got2 = Graph.personalizedPageRank(edges.toDF("src", "dst"),
      Seq(1L, 999L).toDF("node"), iters = 3).as[(Long, Double)]
      .collect().toMap
    val want2 = refPpr(edges, Set(1L), 3)
    got2.foreach { case (v, r) => assert(math.abs(r - want2(v)) < 1e-9) }
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges.toDF("src", "dst"),
        Seq(999L).toDF("node"), iters = 2)
    }
    graft.util.Caches.releaseAll()
  }
}
