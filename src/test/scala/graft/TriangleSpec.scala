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
}
