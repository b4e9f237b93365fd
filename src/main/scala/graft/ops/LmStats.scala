package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus n-gram language-model statistics: bigram counts and conditional
  * probabilities P(w2 | w1) — the building block for vocabulary induction,
  * perplexity-ish corpus scoring, and junk detection (a corpus slice whose
  * top conditionals are boilerplate chains is template spam).
  *
  * Exact counts, so the whole operator is two codegen'd hash aggregates'
  * worth of work: explode adjacent (w1, w2) STRUCT pairs — zip_with over the
  * token array and its shift-by-one slice, the same shifted-slice shape as
  * [[TextFunctions.ngrams]] but without materializing "w1 w2" strings that
  * would immediately be re-split (two string builds + two splits per bigram
  * on the hot path) — count per (w1, w2), then derive the unigram-context
  * count as a window SUM over w1 — no second pass over the corpus and no
  * join. The conditional divides two exact longs, bit-identical across
  * engines.
  *
  * Scale shape: one shuffle for the bigram aggregate (map-side partial
  * combine collapses repeats before the exchange), one for the w1 window.
  * `minCount` prunes the long tail AFTER counting (counts stay exact) —
  * at 100 TB the output is vocabulary²-bounded, not corpus-bounded.
  */
object LmStats {

  def bigramConditionals(docs: DataFrame, textCol: String,
                         minCount: Long): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    // zip_with pads the shorter side with null, so the final (last-token,
    // null) pair is dropped by the w2 filter — equivalent to ngrams' n-1
    // bigrams per doc (and [] for docs under 2 tokens).
    val pairs = zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val counts = docs.select(explode(pairs).as("bg"))
      .filter(col("bg.w2").isNotNull)
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    counts
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy("w1")))
      .filter(col("c12") >= minCount)
      .withColumn("p", col("c12").cast("double") / col("c1"))
  }
}
