package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Class-based TF-IDF keyword extraction (the c-TF-IDF of Grootendorst
  * 2022): treat every class/cluster as ONE concatenated document and ask
  * which terms are DISCRIMINATIVE for it — the readout that turns an
  * opaque clustering (k-means cells, near-dup groups, language slices,
  * topic assignments) into something a human can audit. The corpus-scale
  * counterpart of per-document TF-IDF: grain is (class, term), never
  * (doc, term).
  *
  * Score: `(n_tc / N_c) · ln(1 + A / f_t)` — within-class term share,
  * damped by how common the term is ACROSS classes (`f_t` = the term's
  * total count, `A` = average class token count). Class-size
  * normalization keeps big classes from dominating the keyword lists.
  *
  * Determinism: all counts exact integers; per-(class, term) score is a
  * fixed IEEE tree (two divisions, one ln, one multiply), micro-quantized
  * on output; the top-k cut orders by RAW double then term (the q155
  * tie discipline).
  *
  * Scale shape: ONE tokenize scan → (class, term) counts (the only
  * corpus-sized shuffle, map-side combinable) → class totals broadcast,
  * term totals join at vocab grain, the global average rides a one-row
  * broadcast → per-class top-k via the bounded native
  * [[graft.functions.expressions.TopKAgg]] (map-side k-capped buffers,
  * no Window sort). Output is |classes|·k rows however large the corpus.
  */
object Keywords {

  /** @return (cls, term, score_micro, rnk) — top `topK` terms per class,
    *         rank 1 = most discriminative
    */
  def cTfIdf(docs: DataFrame, classCol: String, textCol: String,
             topK: Int = 10): DataFrame = {
    require(topK >= 1, s"cTfIdf: topK must be >= 1, got $topK")
    val tok = docs
      .filter(col(classCol).isNotNull && col(textCol).isNotNull)
      .select(col(classCol).as("cls"),
        explode(TF.tokens(col(textCol))).as("term"))
    val ntc = graft.util.Caches.cache(
      tok.groupBy("cls", "term").agg(count(lit(1)).as("n_tc"))).toDF
    val nc = ntc.groupBy("cls").agg(sum(col("n_tc")).as("n_c"))
    val ft = ntc.groupBy("term").agg(sum(col("n_tc")).as("f_t"))
    val avg = nc.agg(sum(col("n_c")).as("__tot"), count(lit(1)).as("__k"))
    val raw = (col("n_tc").cast("double") / col("n_c").cast("double")) *
      log(lit(1.0) + (col("__tot").cast("double") / col("__k").cast("double"))
        / col("f_t").cast("double"))
    ntc.join(broadcast(nc), Seq("cls"))
      .join(ft, Seq("term"))
      .crossJoin(broadcast(avg))
      .select(col("cls"), col("term"), raw.as("raw"))
      .groupBy("cls")
      .agg(graft.functions.expressions.TopKAgg.topK(
        col("raw"), col("term"), topK).as("top"))
      .select(col("cls"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("cls"), col("t.id").as("term"),
        floor(col("t.score") * lit(1000000.0) + lit(0.5)).cast("long")
          .as("score_micro"),
        (col("i") + 1).cast("long").as("rnk"))
  }
}
