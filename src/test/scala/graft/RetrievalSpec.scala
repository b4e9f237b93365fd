package graft

import org.apache.spark.sql.functions._
import graft.ops.Retrieval

/** BM25: differential against a driver-side reference, ranking shape
  * (term frequency up, document length down, rare terms weigh more),
  * and partitioning invariance of the decimal-accumulated scores.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark query engine"),
    (2L, "query query query optimizer"),
    (3L, "a very long document about nothing in particular with many words"),
    (4L, "query"),
    (5L, "unrelated text entirely"),
    (6L, "rare query")).toDF("doc_id", "text")

  private def ref(docs: Seq[(Long, String)], terms: Seq[String],
                  k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val dl = toks.map { case (id, ts) => id -> ts.size }.toMap
    val n = toks.count(_._2.nonEmpty)
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    terms.flatMap { t =>
      val df = toks.count(_._2.contains(t))
      if (df == 0) Nil
      else {
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        toks.collect { case (id, ts) if ts.contains(t) =>
          val tf = ts.count(_ == t)
          id -> idf * (tf * (k1 + 1.0)) /
            (tf + k1 * (1.0 - b + b * dl(id) / avgdl))
        }
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
  }

  test("bm25 matches the reference scorer; tf up, length down, rarity up") {
    val got = Retrieval.bm25(corpus, "doc_id", "text",
        Seq("query", "rare"), topK = 10)
      .as[(Long, Double)].collect().toMap
    val want = ref(Seq((1L, "spark query engine"),
      (2L, "query query query optimizer"),
      (3L, "a very long document about nothing in particular with many words"),
      (4L, "query"), (5L, "unrelated text entirely"), (6L, "rare query")),
      Seq("query", "rare"))
    assert(got.keySet == want.keySet, s"$got vs $want")
    got.foreach { case (id, s) =>
      assert(math.abs(s - want(id)) < 1e-6, s"doc $id: $s vs ${want(id)}")
    }
    // rarity: 'rare' (df=1) outweighs one 'query' (df=4) — doc 6 beats doc 1
    assert(got(6L) > got(1L))
    // term frequency: doc 2 (3x query) beats doc 1 (1x query)
    assert(got(2L) > got(1L))
    // no-match docs don't appear
    assert(!got.contains(5L) && !got.contains(3L))
  }

  test("bm25 is partitioning-invariant and the top-k cut is stable") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25(df, "doc_id", "text", Seq("query", "rare"), topK = 3)
        .as[(Long, Double)].collect().toSeq
    assert(run(corpus.repartition(7)) == run(corpus.coalesce(1)))
  }

  test("bm25All ≡ one bm25 call per query, with shared corpus stats (r11)") {
    val qs = Seq((10L, "query rare"), (20L, "spark optimizer"),
      (30L, "Query  SPARK"), // case/whitespace normalize like the corpus
      (40L, "absent tokens only zzz")).toDF("query_id", "qtext")
    val batch = Retrieval.bm25All(corpus, "doc_id", "text",
        qs, "query_id", "qtext", topK = 3)
      .select($"query_id", $"doc_id", $"score", $"rnk")
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    def single(terms: Seq[String]): Seq[(Long, Double)] =
      Retrieval.bm25(corpus, "doc_id", "text", terms, topK = 3)
        .as[(Long, Double)].collect().toSeq
    assert(batch(10L) == single(Seq("query", "rare")))
    assert(batch(20L) == single(Seq("spark", "optimizer")))
    assert(batch(30L) == single(Seq("query", "spark")))
    // a query whose terms miss the corpus entirely ranks nothing
    assert(!batch.contains(40L))
    // partitioning invariance carries over to the batch shape
    val again = Retrieval.bm25All(corpus.repartition(7), "doc_id", "text",
        qs.repartition(3), "query_id", "qtext", topK = 3)
      .select($"query_id", $"doc_id", $"score", $"rnk")
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    assert(again == batch)
  }

  test("rrfFuse: analytic scores, missing-item zero, stable tie cut (r15)") {
    import graft.ops.Retrieval.rrfFuse
    val r1 = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rnk")
    val r2 = Seq((20L, 1L), (40L, 2L), (10L, 3L)).toDF("id", "rnk")
    val got = rrfFuse(Seq(r1, r2), "id", "rnk", k0 = 60, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def m(ranks: Seq[Long]): Long =
      math.floor(ranks.map(r => 1.0 / (60.0 + r)).sum * 1e6 + 0.5).toLong
    assert(got == Map(10L -> m(Seq(1, 3)), 20L -> m(Seq(2, 1)),
      30L -> m(Seq(3)), 40L -> m(Seq(2))))
    // the tie between 30 (rank 3 in r1 only) and 40 (rank... different)
    // — craft an exact tie and pin the id-ordered cut at topK = 1
    val t1 = Seq((1L, 5L)).toDF("id", "rnk")
    val t2 = Seq((2L, 5L)).toDF("id", "rnk")
    val cut = rrfFuse(Seq(t1, t2), "id", "rnk", k0 = 60, topK = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(cut == Seq(1L), "equal scores must cut on the id tiebreak")
    intercept[IllegalArgumentException] {
      rrfFuse(Seq(r1), "id", "rnk", topK = 5)
    }
  }

  test("rrfFuseAll ≡ one rrfFuse per query; one TopKAgg plan, no per-" +
      "query sort (r15)") {
    // three queries with overlapping-but-distinct rankings, including a
    // query present in only one ranking table and an exact tie
    val a = Seq(("q1", 10L, 1L), ("q1", 20L, 2L), ("q1", 30L, 3L),
      ("q2", 20L, 1L), ("q2", 10L, 2L),
      ("q3", 7L, 5L)).toDF("qid", "id", "rnk")
    val b = Seq(("q1", 20L, 1L), ("q1", 40L, 2L), ("q1", 10L, 3L),
      ("q2", 30L, 1L),
      ("q4", 8L, 5L)).toDF("qid", "id", "rnk")
    val batch = Retrieval.rrfFuseAll(Seq(a, b), "qid", "id", "rnk",
        k0 = 60, topK = 3)
      .select("qid", "id", "rrf_micro", "rnk")
      .as[(String, Long, Long, Long)].collect().toSet
    val perQuery = Seq("q1", "q2", "q3", "q4").flatMap { q =>
      val ra = a.filter($"qid" === q).select("id", "rnk")
      val rb = b.filter($"qid" === q).select("id", "rnk")
      Retrieval.rrfFuse(Seq(ra, rb), "id", "rnk", k0 = 60, topK = 3)
        .collect().zipWithIndex
        .map { case (r, i) => (q, r.getLong(0), r.getLong(1), i + 1L) }
    }.toSet
    assert(batch == perQuery, s"batch $batch vs perQuery $perQuery")
    // the plan cuts per query with ONE TopKAgg hash aggregate — never a
    // per-query Window sort over the fused rows
    val pl = Retrieval.rrfFuseAll(Seq(a, b), "qid", "id", "rnk")
      .queryExecution.executedPlan.toString
    assert(pl.contains("top_k"), pl.take(800))
    assert(!pl.contains("Window"), pl.take(800))
  }
}
