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
  * worth of work: explode adjacent bigrams (non-distinct [[TextFunctions
  * .ngrams]]), count per (w1, w2), then derive the unigram-context count as
  * a window SUM over w1 — no second pass over the corpus and no join. The
  * conditional divides two exact longs, bit-identical across engines.
  *
  * Scale shape: one shuffle for the bigram aggregate (map-side partial
  * combine collapses repeats before the exchange), one for the w1 window.
  * `minCount` prunes the long tail AFTER counting (counts stay exact) —
  * at 100 TB the output is vocabulary²-bounded, not corpus-bounded.
  */
object LmStats {

  def bigramConditionals(docs: DataFrame, textCol: String,
                         minCount: Long): DataFrame = {
    val grams = docs.select(
      explode(TextFunctions.ngrams(TextFunctions.tokens(col(textCol)), 2)).as("bg"))
    val counts = grams
      .select(element_at(split(col("bg"), " "), 1).as("w1"),
        element_at(split(col("bg"), " "), 2).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    counts
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy("w1")))
      .filter(col("c12") >= minCount)
      .withColumn("p", col("c12").cast("double") / col("c1"))
  }
}
