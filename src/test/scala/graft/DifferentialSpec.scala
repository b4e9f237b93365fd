package graft

import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, SetSimJoin, SimHashDedup, Similarity}
import graft.sources.Tables

/** Differential tests: the custom operators vs brute-force Scala reference
  * implementations on seeded random data — the strongest correctness
  * evidence for operators whose semantics aren't a single built-in.
  */
class DifferentialSpec extends SparkSpec {
  import spark.implicits._

  test("AsOfJoin.backward matches brute-force on random data") {
    val rnd = new scala.util.Random(7)
    val left = List.fill(120)((rnd.nextInt(5), rnd.nextInt(1000).toLong, rnd.nextInt(99)))
    val right = List.fill(120)((rnd.nextInt(5), rnd.nextInt(1000).toLong, rnd.nextInt(99)))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toList // unique (k,t)
    val lDf = left.toDF("k", "t", "ltag")
    val rDf = right.toDF("k", "rt", "payload")
    val got = AsOfJoin.backward(lDf, rDf, "k", "t", "rt", Seq("payload"))
      .select("k", "t", "ltag", "asof_payload")
      .as[(Int, Long, Int, Option[Int])].collect().toSeq.sorted
    val expected = left.map { case (k, t, tag) =>
      val candidates = right.filter(r => r._1 == k && r._2 <= t)
      val best = if (candidates.isEmpty) None
        else Some(candidates.maxBy(_._2)._3)
      (k, t, tag, best)
    }.sorted
    assert(got == expected)
  }

  test("SetSimJoin.jaccardPairs matches brute-force all-pairs on random docs") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (1L to 40L).map(i =>
      (i, List.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val got = SetSimJoin.jaccardPairs(df, "doc_id", "text", shingleN = 2,
        threshold = 0.25)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    def bigrams(s: String): Set[String] =
      s.split("\\s+").toList.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSet
    val expected = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = bigrams(ta); sb = bigrams(tb)
      if sa.nonEmpty && sb.nonEmpty
      inter = (sa intersect sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= 0.25
    } yield (ia, ib)).toSet
    assert(got == expected)
  }

  private def randomVecs(n: Int, dim: Int, seed: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i => (i, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
  }

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    if (na * nb == 0) 0.0 else dot / (na * nb)
  }

  test("Similarity.thresholdPairs (blocked) matches brute-force all-pairs") {
    val vecs = randomVecs(80, 16, seed = 23)
    val df = vecs.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = Similarity.thresholdPairs(df, threshold = 0.3, blocks = 7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
      if cosine(va, vb) >= 0.3
    } yield (ia, ib)).toSet
    assert(got == expected)
    // every pair exactly once, no diagonal dupes
    val all = Similarity.thresholdPairs(df, threshold = -1.0, blocks = 7)
    assert(all.count() == 80L * 79 / 2)
  }

  test("Similarity.lshThresholdPairs ⊆ exact tier; full recall on planted near-dups") {
    val rnd = new scala.util.Random(31)
    val base = Seq.fill(60)(Seq.fill(32)(rnd.nextFloat() * 2 - 1))
    // plant: every 4th vector gets a tiny-perturbation twin (cosine ≈ 0.999)
    val vecs: Seq[(Long, Seq[Float])] = base.zipWithIndex.flatMap { case (v, i) =>
      val twin = if (i % 4 == 0)
        Seq((1000L + i, v.map(x => x + rnd.nextFloat() * 0.02f))) else Seq.empty
      (i.toLong, v) +: twin
    }
    val df = vecs.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val exact = Similarity.thresholdPairs(df, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Similarity.lshThresholdPairs(df, threshold = 0.9,
        nBits = 8, nTables = 12, dim = 32)
      .as[(Long, Long, Double)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH must never invent or rescore pairs")
    val planted = exact.filter(_._3 >= 0.99)
    assert(planted.nonEmpty && planted.subsetOf(lsh),
      s"planted near-dups must all be recalled: missing ${planted.diff(lsh)}")
  }

  test("ivfSearch with nprobe = nlist degrades to exact brute-force top-k") {
    import graft.sources.Tables
    val emb = Tables.embeddings(spark, sf())
    val centroids = emb.filter(col("vec_id") < 8)
    val queries = emb.filter(col("vec_id") >= 10 && col("vec_id") <= 14)
    // probing EVERY cell makes the candidate set the whole corpus — the
    // approximate index must then reproduce the exact answer
    val ivf = Similarity.ivfSearch(emb, centroids, queries, nprobe = 8, k = 3)
      .select("query_id", "nn_id", "score", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSet
    graft.util.Caches.releaseAll()
    val exact = Similarity.bruteForceTopK(emb, queries, k = 3)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(ivf == exact)
  }

  test("simhashPrints (counted pre-agg) matches the per-token-row formulation") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val got = SimHashDedup.simhashPrints(docs, "doc_id", "text")
    // the round-1 formulation: 64 conditional ±1 sums over raw token rows
    val tokenRows = docs
      .select(col("doc_id").as("id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("h"))
    val votes = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        .as(s"v$j"))
    val reference = tokenRows.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until 64).map(j =>
          when(col(s"v$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("sh"))
    assert(got.as[(Long, Long)].collect().toSet ==
      reference.as[(Long, Long)].collect().toSet)
  }
}
