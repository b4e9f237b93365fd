package graft

import org.apache.spark.sql.functions._
import graft.ops.TextClassifier

/** Linear classifier inference (fastText shape): hand-computable scores,
  * OOV dilution, bigram features, and partitioning invariance.
  */
class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val weights = Seq(
    ("good", 2.0), ("clean", 1.0), ("spam", -3.0), ("good_clean", 4.0))
    .toDF("term", "wt")

  private def sig(x: Double): Double =
    math.rint(1.0 / (1.0 + math.exp(-x)) * 1e6) / 1e6

  test("scores are the sigmoid of the mean feature weight") {
    val docs = Seq(
      (1L, "good clean"),       // uni: good(2) clean(1); bi: good_clean(4)
      (2L, "spam spam"),        // uni: spam(-3) ×2; bi: spam_spam(0, OOV)
      (3L, "totally unknown"))  // all OOV -> sigmoid(bias)
      .toDF("doc_id", "text")
    val got = TextClassifier.scoreLinear(docs, "doc_id", "text",
        weights, "term", "wt", bias = 0.5)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((3L, sig(0.5 + (2.0 + 1.0 + 4.0) / 3))))
    assert(got(2L) == ((3L, sig(0.5 + (-3.0 - 3.0 + 0.0) / 3))))
    assert(got(3L) == ((3L, sig(0.5 + 0.0))))
  }

  test("OOV features DILUTE the mean — padding cannot inflate a score") {
    val docs = Seq((1L, "good"), (2L, "good zz zz zz zz"))
      .toDF("doc_id", "text")
    val got = TextClassifier.scoreLinear(docs, "doc_id", "text",
        weights, "term", "wt")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) > got(2L),
      s"padded doc (${got(2L)}) must score below the clean one (${got(1L)})")
  }

  test("unigram-only mode drops bigram features; invariant to partitioning") {
    val docs = Seq((1L, "good clean")).toDF("doc_id", "text")
    val uniOnly = TextClassifier.scoreLinear(docs, "doc_id", "text",
        weights, "term", "wt", bigrams = false)
      .as[(Long, Long, Double)].head()
    assert(uniOnly == ((1L, 2L, sig((2.0 + 1.0) / 2))))
    val big = sources.Tables.documents(spark, sf("0.01"))
    val a = TextClassifier.scoreLinear(big, "doc_id", "text",
      weights, "term", "wt").orderBy("doc_id").collect().toSeq
    val b = TextClassifier.scoreLinear(big.repartition(7), "doc_id", "text",
      weights, "term", "wt").orderBy("doc_id").collect().toSeq
    assert(a == b, "scores must not depend on physical partitioning")
  }
}
