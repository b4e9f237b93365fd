package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** MMR diversity re-ranking: hand-computed greedy picks, λ=1 degeneration
  * to pure relevance, tie discipline, short candidate lists, zero-vector
  * guard, driver-side greedy differential, repartition invariance.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong

  // a and b are redundant (same direction); c is orthogonal
  private val hand = Seq(
    (1L, 10L, 1.0, Array(1.0f, 0.0f)),
    (1L, 11L, 0.9, Array(1.0f, 0.0f)),
    (1L, 12L, 0.5, Array(0.0f, 1.0f))
  ).toDF("query_id", "id", "rel", "vec")

  test("mmrSelect: diversity beats redundancy — the orthogonal candidate " +
      "wins pick 2 (r15)") {
    val got = Similarity.mmrSelect(hand, "query_id", "id", "rel", "vec",
      k = 2, lambda = 0.5)
      .as[(Long, Long, Long, Long)].collect().toSet
    // step 1: argmax 0.5·rel → id 10 (mmr 0.5)
    // step 2: id 11 scores 0.45 − 0.5·1 = −0.05; id 12 scores 0.25 − 0
    assert(got == Set((1L, 10L, 1L, micro(0.5)), (1L, 12L, 2L, micro(0.25))))
    graft.util.Caches.releaseAll()
  }

  test("mmrSelect: λ=1 degenerates to pure relevance order") {
    val got = Similarity.mmrSelect(hand, "query_id", "id", "rel", "vec",
      k = 3, lambda = 1.0)
      .orderBy("step").select("id").as[Long].collect().toSeq
    assert(got == Seq(10L, 11L, 12L))
    graft.util.Caches.releaseAll()
  }

  test("mmrSelect: exact ties break on id ascending; k beyond the list " +
      "returns min(n, k) rows; zero vectors guard to sim 0") {
    val tied = Seq(
      (1L, 21L, 0.8, Array(0.0f, 0.0f)),
      (1L, 20L, 0.8, Array(0.0f, 0.0f))
    ).toDF("query_id", "id", "rel", "vec")
    val got = Similarity.mmrSelect(tied, "query_id", "id", "rel", "vec",
      k = 5, lambda = 0.75)
      .orderBy("step").select("id", "step").as[(Long, Long)].collect().toSeq
    // zero vectors: sim 0 everywhere, so pick 2 is again pure-rel, tie on id
    assert(got == Seq((20L, 1L), (21L, 2L)))
    graft.util.Caches.releaseAll()
  }

  test("mmrSelect: differential vs a driver-side greedy replay; " +
      "repartition invariance") {
    val rnd = new scala.util.Random(17)
    val rows = for (q <- 1 to 2; c <- 0 until 20) yield
      (q.toLong, c.toLong, rnd.nextDouble(),
        Array.fill(8)(rnd.nextFloat() * 2 - 1))
    val df = rows.toDF("query_id", "id", "rel", "vec")
    val lam = 0.75; val k = 5
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) 0.0 else d / den
    }
    val want = rows.groupBy(_._1).flatMap { case (q, cs) =>
      var sel = Vector.empty[(Long, Long, Long)] // (id, step, mmr_micro)
      var rem = cs.toVector
      for (step <- 1 to k if rem.nonEmpty) {
        val scored = rem.map { r =>
          val div = if (sel.isEmpty) 0.0
            else sel.map(s => cos(r._4,
              cs.find(_._2 == s._1).get._4)).max
          (r._2, lam * r._3 - (1.0 - lam) * div)
        }
        val (pid, pmmr) = scored.minBy { case (id, m) => (-m, id) }
        sel :+= ((pid, step.toLong, micro(pmmr)))
        rem = rem.filterNot(_._2 == pid)
      }
      sel.map { case (id, step, m) => (q, id, step, m) }
    }.toSet
    val got = Similarity.mmrSelect(df, "query_id", "id", "rel", "vec",
      k = k, lambda = lam)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    val re = Similarity.mmrSelect(df.repartition(9), "query_id", "id",
      "rel", "vec", k = k, lambda = lam)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(re == want)
    graft.util.Caches.releaseAll()
  }
}
