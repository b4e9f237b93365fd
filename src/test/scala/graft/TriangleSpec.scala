package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Triangle counting: hand-graph truths, input canonicalization
  * (duplicates / reversed edges / self-loops), and a differential
  * against brute-force triple enumeration on a seeded random graph.
  */
class TriangleSpec extends SparkSpec {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("K4 plus a pendant: every K4 node in 3 triangles, pendant in none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = counts(k4 :+ (4L, 5L))
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // total triangles = sum / 3
    assert(got.values.sum == 4 * 3)
  }

  test("duplicates, reversed edges and self-loops do not change the answer") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val noisy = tri ++ Seq((2L, 1L), (1L, 2L), (3L, 3L), (3L, 1L))
    assert(counts(noisy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(counts(tri) == counts(noisy))
  }

  test("triangle-free graph emits no rows (star and chain)") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L))
    assert(counts(star).isEmpty)
  }

  test("differential vs brute-force triples on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val n = 30
    val edges = (for {
      a <- 1L to n; b <- (a + 1) to n if rnd.nextDouble() < 0.2
    } yield (a, b)).toSeq
    val adj = edges.toSet
    def linked(a: Long, b: Long) =
      adj.contains((a, b)) || adj.contains((b, a))
    val want = (for {
      a <- 1L to n; b <- (a + 1) to n; c <- (b + 1) to n
      if linked(a, b) && linked(b, c) && linked(a, c)
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(counts(edges) == want)
  }

  test("partitioning-invariant (exact integer joins)") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 1L),
      (2L, 4L), (4L, 5L), (5L, 1L))
    val a = counts(edges)
    val b = Graph.triangleCounts(edges.toDF("src", "dst").repartition(7))
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  private def core(edges: Seq[(Long, Long)], k: Int,
                   rounds: Int = 12): Map[Long, Long] =
    Graph.kCore(edges.toDF("src", "dst"), k, rounds)
      .as[(Long, Long)].collect().toMap

  test("kCore: the pendant chain cascades off, the clique survives") {
    // K4 with a chain 4-5-6 hanging off: 2-core = the K4 (5 and 6 peel
    // in cascade — 6 first, then 5 loses its last neighbor's support)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val got = core(edges, k = 2)
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_ == 3L)) // degrees within the K4
    // 4-core of a K4 is empty (max degree 3)
    assert(core(edges, k = 4).isEmpty)
  }

  test("kCore: differential vs reference peeling on a seeded random graph") {
    val rnd = new scala.util.Random(11)
    val n = 40
    val edges = (for {
      a <- 1L to n; b <- (a + 1) to n if rnd.nextDouble() < 0.15
    } yield (a, b)).toSeq
    def refCore(k: Int): Map[Long, Long] = {
      var alive = (edges.map(_._1) ++ edges.map(_._2)).toSet
      var done = false
      var deg = Map.empty[Long, Long]
      while (!done) {
        val live = edges.filter(e => alive(e._1) && alive(e._2))
        deg = (live.map(_._1) ++ live.map(_._2))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val next = alive.filter(v => deg.getOrElse(v, 0L) >= k)
        done = next == alive
        alive = next
      }
      alive.map(v => v -> deg(v)).toMap
    }
    for (k <- Seq(2, 3, 4)) {
      val got = core(edges, k)
      assert(got == refCore(k), s"k=$k")
      // fixpoint REACHED by the bounded rounds: one more round, same set
      // (this seeded graph's k=4 cascade takes exactly 12 — peeling can
      // expose one node per round, so fewer rounds may legitimately
      // differ; the +1 comparison is the convergence certificate)
      assert(got == core(edges, k, rounds = 13), s"k=$k stability")
    }
  }
}
