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

  /** Per-document bits-per-bigram cross-entropy under an add-alpha-smoothed
    * bigram model fit on the corpus itself — the CCNet-style LM quality
    * gate: template/boilerplate text is highly predictable and scores LOW,
    * natural prose sits mid-range, gibberish scores HIGH, so thresholding
    * both tails cleans a crawl. Smoothing keeps every probability finite;
    * because the model is fit on the scored corpus, every scored bigram has
    * c12 ≥ 1 and the join below is lossless.
    *
    * Determinism across engines: each per-bigram −log2 p is rounded to 12
    * decimals and accumulated as an exact decimal, so the per-doc sum is
    * partition-order-independent and the DuckDB oracle hash-matches — the
    * standard trick any float aggregate in this repo uses (cf. Num.dsum).
    *
    * Scale shape: one cached bigram projection feeds both the LM aggregate
    * and the scoring join (corpus tokenized ONCE); the (w1,w2) join
    * shuffles bigrams by composite key — vocabulary²-bounded model side,
    * map-side-combined counts; the vocab-size scalar broadcasts. Docs with
    * fewer than 2 tokens have no bigrams and drop out (score undefined).
    *
    * @return (idCol, n_bigrams, bits_per_bigram)
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                alpha: Double = 0.5): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val pairs = zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val docBigrams = graft.util.Caches.cache(
      docs.select(col(idCol), explode(pairs).as("bg"))
        .filter(col("bg.w2").isNotNull)
        .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))).toDF
    val lm = docBigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy("w1")))
    val vocab = lm.agg(countDistinct(col("w2")).as("v"))
    docBigrams.join(lm, Seq("w1", "w2"))
      .crossJoin(broadcast(vocab))
      .withColumn("nll",
        round(-log2((col("c12") + lit(alpha)) / (col("c1") + lit(alpha) * col("v"))), 12)
          .cast(org.apache.spark.sql.types.DecimalType(38, 18)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 6).as("bits_per_bigram"))
  }

  /** Cross-corpus NOVELTY scoring: bits/bigram of `docs` under a bigram
    * LM trained on a REFERENCE corpus — high = content the reference has
    * not seen (distribution shift, fresh-crawl triage); low against an
    * eval-set reference is a contamination signal ([[scoreDocs]] is the
    * self-trained sibling, where this cross-corpus direction is the
    * operator a mixing pipeline actually runs). Laplace-α smoothing keeps
    * unseen mass finite and DISTINGUISHES the two unseen cases: an unseen
    * successor in a SEEN context pays `(0+α)/(c1+αV)` (the context count
    * joins separately — folding it to 0 would overestimate novelty mass),
    * an unseen context pays the uniform `1/V`.
    *
    * Determinism and scale shape are [[scoreDocs]]'s: per-bigram nll
    * rounded to 12dp then DECIMAL-summed (no float accumulation order),
    * one explode per corpus, the LM aggregates broadcast-joined back.
    * A reference with NO bigrams has no vocabulary to smooth over —
    * scoring then fails loudly (ANSI division by zero), which is the
    * right answer to "score against nothing".
    *
    * @return (idCol, n_bigrams, bits_per_bigram) for scored docs with ≥ 1
    *         bigram
    */
  def scoreDocsAgainst(docs: DataFrame, idCol: String, textCol: String,
                       ref: DataFrame, refTextCol: String,
                       alpha: Double = 0.5): DataFrame = {
    def bigrams(df: DataFrame, textC: String, idCols: Seq[String]): DataFrame = {
      val toks = TextFunctions.tokens(col(textC))
      val pairs = zip_with(toks,
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))
      df.select((idCols.map(col) :+ explode(pairs).as("bg")): _*)
        .filter(col("bg.w2").isNotNull)
        .select((idCols.map(col) :+ col("bg.w1").as("w1")) :+
          col("bg.w2").as("w2"): _*)
    }
    val refBg = graft.util.Caches.cache(bigrams(ref, refTextCol, Nil)).toDF
    val pairLm = refBg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val ctxLm = refBg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = refBg.agg(countDistinct(col("w2")).as("v"))
    bigrams(docs, textCol, Seq(idCol))
      .join(pairLm, Seq("w1", "w2"), "left")
      .join(ctxLm, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("nll",
        round(-log2((coalesce(col("c12"), lit(0L)) + lit(alpha)) /
          (coalesce(col("c1"), lit(0L)) + lit(alpha) * col("v"))), 12)
          .cast(org.apache.spark.sql.types.DecimalType(38, 18)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 6)
          .as("bits_per_bigram"))
  }

  /** Per-document character-unigram entropy — the cheapest content-quality
    * screen in the corpus toolbox: repetitive generator junk ("aaaa…",
    * template spam) sits far BELOW natural text's entropy band, base64 /
    * compressed / hex blobs sit far ABOVE it, so one scan flags both
    * tails. `H = ln(n) − (Σ c·ln c)/n` over the per-character counts —
    * algebraically identical to `−Σ p·ln p` but with ONE division instead
    * of one per character class.
    *
    * Deterministic: counts are exact longs; each `c·ln c` term is one
    * double op pair; the term SUM routes through a `DECIMAL(38,12)`
    * accumulator (the q155/BM25 discipline) so partitioning cannot
    * reorder additions; the output is micro-quantized. Scale shape: one
    * explode + two hash aggregates, alphabet-bounded intermediate per
    * document — never more than |doc| rows in flight.
    *
    * @return (idCol, n_chars, entropy_micro) per document with ≥ 1 char
    */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 12)
    docs.select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col(idCol), col("ch"))
      .agg(count(lit(1)).as("c"))
      .withColumn("t",
        (col("c").cast("double") * log(col("c").cast("double"))).cast(dec))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_chars"), sum(col("t")).cast("double").as("s"))
      .select(col(idCol), col("n_chars"),
        floor((log(col("n_chars").cast("double")) -
          col("s") / col("n_chars")) * lit(1000000.0) + lit(0.5))
          .cast("long").as("entropy_micro"))
  }
}
