package graft

import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, SetSimJoin}

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
}
