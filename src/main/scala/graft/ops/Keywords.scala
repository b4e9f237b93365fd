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

  /** PMI collocations (Church & Hanks 1990): rank adjacent word pairs by
    * `ln( p(w1,w2) / (p(w1)·p(w2)) )` — pairs that co-occur far more than
    * their parts predict. THE phrase-mining primitive (tokenizer-vocab
    * candidates, multi-word entities, domain jargon discovery).
    * `minCount` gates the known PMI failure mode — hapax pairs maximize
    * it — while the probabilities stay those of the FULL corpus (the
    * gate selects reportable pairs; it must not bias their scores).
    *
    * Determinism: all counts exact; one fixed IEEE tree per pair (three
    * divisions, one ln), ranked on the RAW double with (w1, w2) ties
    * (q155 discipline), micro-quantized on output.
    *
    * Scale shape: ONE tokenize scan feeds both count tables (unigram and
    * bigram grains, both map-side combinable); totals ride one-row
    * broadcasts; the bigram→unigram probability joins are vocab-grain;
    * the final cut is `TakeOrderedAndProject` (no global sort).
    *
    * @return top `topK`: (w1, w2, n_pair, pmi_micro)
    */
  def pmiCollocations(docs: DataFrame, textCol: String, minCount: Long = 5,
                      topK: Int = 20): DataFrame = {
    require(minCount >= 1, s"pmiCollocations: minCount must be >= 1, got $minCount")
    require(topK >= 1, s"pmiCollocations: topK must be >= 1, got $topK")
    val base = graft.util.Caches.cache(docs
      .filter(col(textCol).isNotNull)
      .select(TF.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 1)).toDF
    val uni = graft.util.Caches.cache(
      base.select(explode(col("__toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("__cw"))).toDF
    val pairExpr = zip_with(col("__toks"),
      slice(col("__toks"), lit(2), greatest(size(col("__toks")) - 1, lit(0))),
      (a, b) => when(b.isNotNull, struct(a.as("w1"), b.as("w2"))))
    val bi = base.select(explode(pairExpr).as("__p"))
      .filter(col("__p").isNotNull)
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
    val nUni = uni.agg(sum(col("__cw")).as("__nu"))
    val nBi = bi.agg(sum(col("n_pair")).as("__nb"))
    val pmi = log((col("n_pair").cast("double") / col("__nb").cast("double")) /
      ((col("__c1").cast("double") / col("__nu").cast("double")) *
        (col("__c2").cast("double") / col("__nu").cast("double"))))
    bi.filter(col("n_pair") >= minCount)
      .join(uni.select(col("w").as("w1"), col("__cw").as("__c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("__cw").as("__c2")), Seq("w2"))
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .withColumn("__pmi", pmi)
      .orderBy(col("__pmi").desc, col("w1"), col("w2"))
      .limit(topK)
      .select(col("w1"), col("w2"), col("n_pair"),
        floor(col("__pmi") * lit(1000000.0) + lit(0.5)).cast("long")
          .as("pmi_micro"))
  }
}
