package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions

/** Linear text-classifier INFERENCE at corpus scale — the fastText shape
  * (Joulin et al. 2016, "Bag of Tricks for Efficient Text Classification"):
  * a document's score is `σ(bias + mean over features of their weights)`,
  * features are unigrams plus adjacent-bigram terms, and the WEIGHTS are a
  * table (the trained model — training happens offline on labels; scoring
  * the other 100 TB is the distributed job). This is the standard
  * quality-filter classifier of the CCNet/LLaMA data pipelines: train a
  * small linear model "does this look like reference text?", then gate the
  * whole corpus on its score.
  *
  * Scale shape: the corpus tokenizes ONCE into (doc, feature) pairs — a
  * pure generator projection, no shuffle; the model joins as a BROADCAST
  * (a linear vocab model is MBs at any realistic vocabulary — never
  * shuffle a corpus against a model); out-of-vocabulary features count
  * toward the mean with weight 0 (the fastText convention — unknown terms
  * dilute, they don't vanish, so spam padded with gibberish cannot inflate
  * its score); the per-document reduction is one map-side-combined hash
  * aggregate with a DECIMAL weight accumulator (order-independent sums —
  * the oracle replays them exactly). Everything is codegen'd builtins.
  *
  * Determinism: `σ` and the mean run in IEEE doubles on identical inputs
  * both engines; scores round to 6 dp.
  */
object TextClassifier {

  /** Score every document against a linear bag-of-features model.
    *
    * @param weights (termCol, weightCol) model table; bigram features are
    *                keyed `"w1_w2"` (underscore join)
    * @param bigrams include adjacent-bigram features (fastText's default
    *                quality-classifier configuration)
    * @return (idCol, n_features, score [σ, 6 dp]) — one row per document
    *         with at least one token
    */
  def scoreLinear(docs: DataFrame, idCol: String, textCol: String,
                  weights: DataFrame, termCol: String, weightCol: String,
                  bias: Double = 0.0, bigrams: Boolean = true): DataFrame = {
    val dec = DecimalType(38, 12)
    val toks = TextFunctions.tokens(col(textCol))
    val base = docs.select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) >= 1)
    val uni = base.select(col(idCol), explode(col("__toks")).as("__f"))
    val feats =
      if (!bigrams) uni
      else {
        val pairs = zip_with(col("__toks"),
          slice(col("__toks"), lit(2),
            greatest(size(col("__toks")) - 1, lit(0))),
          (a, b) => when(b.isNotNull, concat(a, lit("_"), b)))
        uni.unionByName(base.select(col(idCol),
          explode(pairs).as("__f")).filter(col("__f").isNotNull))
      }
    val w = weights.select(col(termCol).as("__f"),
      col(weightCol).cast("double").as("__w"))
    feats.join(broadcast(w), Seq("__f"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"),
        sum(coalesce(col("__w"), lit(0.0)).cast(dec)).cast("double").as("__sw"))
      .select(col(idCol), col("n_features"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(lit(bias) + col("__sw") / col("n_features")))), 6).as("score"))
  }
}
