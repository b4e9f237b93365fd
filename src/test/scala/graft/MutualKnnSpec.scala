package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Mutual-kNN reciprocal filter: hand case with a hub, symmetry/ordering
  * invariants against the real embedding table, edge-grain plan.
  */
class MutualKnnSpec extends SparkSpec {
  import spark.implicits._

  test("mutualPairs: hand case — one-sided hub edges drop, reciprocal " +
      "pairs keep, a<b once (r15)") {
    // kNN edge list: 1↔2 reciprocal; 3→1 one-sided (1 does not list 3);
    // 2↔3 reciprocal, emitted once despite both directions present
    val knn = Seq((1L, 2L), (2L, 1L), (3L, 1L), (2L, 3L), (3L, 2L))
      .toDF("query_id", "nn_id")
    val got = Similarity.mutualPairs(knn, "query_id", "nn_id")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 3L)))
  }

  test("mutualPairs over bruteForceTopK: every pair is reciprocal in the " +
      "kNN table and appears once, ordered") {
    val emb = graft.sources.Tables.embeddings(spark, sf())
      .filter($"vec_id" < 100)
    val knn = Similarity.bruteForceTopK(emb, emb, k = 4)
      .select($"query_id", $"nn_id")
    val edges = knn.as[(Long, Long)].collect().toSet
    val got = Similarity.mutualPairs(knn, "query_id", "nn_id")
      .as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "each pair once")
    got.foreach { case (a, b) =>
      assert(a < b, s"ordering violated: ($a, $b)")
      assert(edges.contains((a, b)) && edges.contains((b, a)),
        s"($a, $b) not reciprocal in the kNN table")
    }
    // and the count matches a driver-side reciprocal filter
    val want = edges.count { case (a, b) => a < b && edges.contains((b, a)) }
    assert(got.length == want)
  }

  test("mutualPairs composes with the LSH tier — the 100 TB path: " +
      "sub-quadratic edges in, the same edge-grain filter") {
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val lshEdges = Similarity.lshTopK(emb, emb, k = 4, nBits = 6,
      nTables = 6).select($"query_id", $"nn_id")
    val es = lshEdges.as[(Long, Long)].collect().toSet
    val got = Similarity.mutualPairs(lshEdges, "query_id", "nn_id")
      .as[(Long, Long)].collect().toSet
    val want = es.filter { case (a, b) => a < b && es.contains((b, a)) }
    assert(got == want && got.nonEmpty,
      s"LSH-edge mutual filter must replicate: ${got.size} vs ${want.size}")
    // the LSH mutual set is a biased-but-overlapping shadow of the exact
    // tier's — same operator, cheaper edges; verify a real overlap
    val exact = Similarity.mutualPairs(
      Similarity.bruteForceTopK(emb, emb, k = 4), "query_id", "nn_id")
      .as[(Long, Long)].collect().toSet
    assert(got.intersect(exact).nonEmpty)
  }

  test("lshKnnEdges ≡ lshTopK with queries = corpus (same buckets, same " +
      "scores, same cut) — without the corpus-broadcast contract (r16)") {
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val self = Similarity.lshKnnEdges(emb, k = 4, nBits = 6, nTables = 6)
      .as[(Long, Long, Double, Long)].collect().toSet
    val bcast = Similarity.lshTopK(emb, emb, k = 4, nBits = 6, nTables = 6)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(self == bcast && self.nonEmpty,
      s"self-join tier diverged from the broadcast tier: " +
        s"${self.size} vs ${bcast.size}")
  }

  test("lshKnnEdges plan: bucket EQUI-join, no nested-loop and no " +
      "mandated corpus broadcast (r16)") {
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val plan = Similarity.lshKnnEdges(emb, k = 4, nBits = 6, nTables = 6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"candidate generation must be the (tbl, bkt) equi-join:\n$plan")
    // the logical plan carries no broadcast() mandate: at small SF the
    // optimizer MAY size-pick BHJ, but at 100 TB the same plan shuffles
    val logical = Similarity.lshKnnEdges(emb, k = 4, nBits = 6, nTables = 6)
      .queryExecution.logical.toString
    assert(!logical.toLowerCase.contains("broadcast"),
      s"no broadcast hint in the self-join tier:\n$logical")
  }
}
