package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Generation-evaluation metrics — the n-gram overlap scores every
  * summarization / translation / distillation pipeline reports before a
  * generated corpus is trusted as training data: BLEU (precision-
  * oriented, Papineni et al. 2002) and ROUGE-N (recall-oriented, Lin
  * 2004) per (candidate, reference) pair.
  *
  * Shared machinery: both sides tokenize once ([[TF.tokens]] — the
  * corpus-wide whitespace convention every text operator shares),
  * n-grams generate per order ([[TF.ngrams]]), counts meet in a
  * (pair, order, gram)-grain join, and CLIPPED matches
  * (`min(c_cand, c_ref)` — a candidate cannot farm credit by repeating
  * a reference gram) aggregate back to pair grain. Every ratio is one
  * IEEE division of exact counts; BLEU's geometric mean and brevity
  * penalty are fixed ln/exp trees, micro-quantized — hash-checkable.
  *
  * Scale shape: gram tables are (pairs × orders × positions) rows —
  * linear in corpus tokens; the join keys on (pair, order, gram), so
  * nothing is ever quadratic; the tokenized base is cached
  * ([[graft.util.Caches]]) because both sides and all orders read it.
  */
object GenMetrics {

  /** BLEU-`maxN` per pair: modified n-gram precisions p₁..p_maxN
    * (clipped matches over candidate gram totals), the brevity penalty
    * `BP = min(1, e^(1 − r/c))`, and
    * `BLEU = BP · exp(Σ ln pₙ / maxN)`. No smoothing — a zero pₙ (or a
    * candidate shorter than maxN tokens, which has no maxN-grams) makes
    * BLEU NULL rather than a silently-smoothed number; report the pₙ
    * columns and let the caller pick a smoothing convention consciously.
    *
    * @param df one row per (idCol, candCol, refCol) pair
    * @return (idCol, c_len, r_len, p1_micro..p{maxN}_micro, bp_micro,
    *         bleu_micro)
    */
  def bleu(df: DataFrame, idCol: String, candCol: String, refCol: String,
           maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"bleu: maxN must be in [1, 8], got $maxN")
    val base = graft.util.Caches.cache(
      df.filter(col(candCol).isNotNull && col(refCol).isNotNull)
        .select(col(idCol), TF.tokens(col(candCol)).as("__ct"),
          TF.tokens(col(refCol)).as("__rt"))).toDF
    val matches = clippedByOrder(base, idCol, maxN)
    def micro(c: Column, as: String) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("long").as(as)
    val pn = (1 to maxN).map(n =>
      when(col(s"__t$n").isNull || col(s"__t$n") === 0, lit(null))
        .otherwise(coalesce(col(s"__m$n"), lit(0L)).cast("double") /
          col(s"__t$n").cast("double")))
    val cl = col("__cl").cast("double")
    val rl = col("__rl").cast("double")
    val bp = when(cl >= rl, lit(1.0)).otherwise(exp(lit(1.0) - rl / cl))
    val lnSum = pn.map(p => log(p)).reduce(_ + _)
    val bleuC = when(pn.map(p => p.isNull || p <= 0.0).reduce(_ || _),
      lit(null)).otherwise(bp * exp(lnSum / lit(maxN.toDouble)))
    base.select(col(idCol), size(col("__ct")).cast("long").as("c_len"),
        size(col("__rt")).cast("long").as("r_len"))
      .join(matches, Seq(idCol), "left")
      .withColumn("__cl", col("c_len")).withColumn("__rl", col("r_len"))
      .select((Seq(col(idCol), col("c_len"), col("r_len")) ++
        pn.zipWithIndex.map { case (p, i) => micro(p, s"p${i + 1}_micro") } ++
        Seq(micro(bp, "bp_micro"), micro(bleuC, "bleu_micro"))): _*)
  }

  /** ROUGE-N per pair: clipped n-gram matches over the REFERENCE total
    * (recall — the number ROUGE is named for), over the candidate total
    * (precision), and their F1. NULL where the denominator side has no
    * n-grams (shorter than n tokens), never 0 — "nothing to match" is
    * not "matched nothing".
    *
    * @return (idCol, n_match, n_cand, n_ref, recall_micro,
    *         precision_micro, f1_micro)
    */
  def rougeN(df: DataFrame, idCol: String, candCol: String, refCol: String,
             n: Int): DataFrame = {
    require(n >= 1 && n <= 8, s"rougeN: n must be in [1, 8], got $n")
    val base = graft.util.Caches.cache(
      df.filter(col(candCol).isNotNull && col(refCol).isNotNull)
        .select(col(idCol), TF.tokens(col(candCol)).as("__ct"),
          TF.tokens(col(refCol)).as("__rt"))).toDF
    def counts(tcol: String, as: String): DataFrame =
      base.select(col(idCol), explode(TF.ngrams(col(tcol), n)).as("__g"))
        .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as(as))
    val joined = counts("__ct", "__cc")
      .join(counts("__rt", "__rc"), Seq(idCol, "__g"), "full_outer")
      .groupBy(col(idCol))
      .agg(sum(least(coalesce(col("__cc"), lit(0L)),
          coalesce(col("__rc"), lit(0L)))).as("n_match"),
        sum(coalesce(col("__cc"), lit(0L))).as("n_cand"),
        sum(coalesce(col("__rc"), lit(0L))).as("n_ref"))
    def micro(c: Column, as: String) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("long").as(as)
    val r = when(col("n_ref") === 0, lit(null))
      .otherwise(col("n_match").cast("double") / col("n_ref").cast("double"))
    val p = when(col("n_cand") === 0, lit(null))
      .otherwise(col("n_match").cast("double") / col("n_cand").cast("double"))
    base.select(col(idCol)).join(joined, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_match"), lit(0L)).as("n_match"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"))
      .select(col(idCol), col("n_match"), col("n_cand"), col("n_ref"),
        micro(r, "recall_micro"), micro(p, "precision_micro"),
        micro(when(r.isNull || p.isNull || (r + p) === 0.0, lit(null))
          .otherwise(lit(2.0) * r * p / (r + p)), "f1_micro"))
  }

  /** chrF_β per pair (Popović 2015) — the CHARACTER n-gram F-score that
    * survives tokenizer disagreements BLEU/ROUGE inherit (morphology,
    * hyphenation, CJK): per order n = 1..`maxN`, clipped char-gram
    * precision and recall; chrF = `(1+β²)·P̄·R̄ / (β²·P̄ + R̄)` over the
    * MEANS of the per-order rates (β = 2 weights recall double — the
    * paper's choice). Characters come from `lower(trim(text))` with ALL
    * whitespace removed (the standard convention: chrF ignores word
    * boundaries); orders longer than the shorter side simply contribute
    * no rate to the mean (absent, not zero). Both means empty → NULL.
    *
    * Determinism: per-order rates are single divisions of exact counts,
    * nano-floored before the (≤ maxN)-term mean sums (commuting
    * integers), the F combine one fixed IEEE tree, micro-quantized.
    *
    * @return (idCol, c_chars, r_chars, pbar_micro, rbar_micro,
    *         chrf_micro)
    */
  def chrF(df: DataFrame, idCol: String, candCol: String, refCol: String,
           maxN: Int = 6, beta: Double = 2.0): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"chrF: maxN must be in [1, 8], got $maxN")
    require(beta > 0.0, s"chrF: beta must be > 0, got $beta")
    def chars(c: Column) =
      regexp_replace(lower(trim(c)), "\\s+", "")
    val base = graft.util.Caches.cache(
      df.filter(col(candCol).isNotNull && col(refCol).isNotNull)
        .select(col(idCol), chars(col(candCol)).as("__cs"),
          chars(col(refCol)).as("__rs"))).toDF
    // char grams via transform over start positions; `substring(str,
    // pos, len)`'s Scala face takes literal ints only, so the position-
    // as-column form goes through the expr face (still codegen'd)
    // the length guard matters: Spark's sequence(1, 0) DESCENDS ([1, 0])
    // instead of being empty, which would mint junk grams for orders
    // longer than the string — an explicit emptiness branch, not greatest
    def grams(scol: String, as: String): DataFrame =
      (1 to maxN).map(n =>
        base.select(col(idCol), lit(n).as("__n"),
          explode(expr(
            s"if(length($scol) >= $n, transform(sequence(1, " +
              s"length($scol) - ${n - 1}), i -> substring($scol, i, $n)), " +
              "array())")).as("__g")))
        .reduce(_ unionByName _)
        .groupBy(col(idCol), col("__n"), col("__g")).agg(count(lit(1)).as(as))
    val perOrder = grams("__cs", "__cc")
      .join(grams("__rs", "__rc"), Seq(idCol, "__n", "__g"), "full_outer")
      .groupBy(col(idCol), col("__n"))
      .agg(sum(least(coalesce(col("__cc"), lit(0L)),
          coalesce(col("__rc"), lit(0L)))).as("__m"),
        sum(coalesce(col("__cc"), lit(0L))).as("__tc"),
        sum(coalesce(col("__rc"), lit(0L))).as("__tr"))
    def nanoSum(c: Column) =
      sum(floor(c * lit(1e9) + lit(0.5)).cast("long"))
    val rates = perOrder.groupBy(col(idCol))
      .agg(
        nanoSum(when(col("__tc") > 0,
          col("__m").cast("double") / col("__tc").cast("double")))
          .as("__ps"),
        count(when(col("__tc") > 0, lit(1))).as("__pn"),
        nanoSum(when(col("__tr") > 0,
          col("__m").cast("double") / col("__tr").cast("double")))
          .as("__rs"),
        count(when(col("__tr") > 0, lit(1))).as("__rn"))
    val pbar = when(col("__pn") === 0, lit(null))
      .otherwise(col("__ps").cast("double") / lit(1e9) /
        col("__pn").cast("double"))
    val rbar = when(col("__rn") === 0, lit(null))
      .otherwise(col("__rs").cast("double") / lit(1e9) /
        col("__rn").cast("double"))
    val b2 = lit(beta * beta)
    val f = when(pbar.isNull || rbar.isNull ||
        (b2 * pbar + rbar) === 0.0, lit(null))
      .otherwise((lit(1.0) + b2) * pbar * rbar / (b2 * pbar + rbar))
    def micro(c: Column, as: String) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("long").as(as)
    base.select(col(idCol), length(col("__cs")).cast("long").as("c_chars"),
        length(col("__rs")).cast("long").as("r_chars"))
      .join(rates, Seq(idCol), "left")
      .select(col(idCol), col("c_chars"), col("r_chars"),
        micro(pbar, "pbar_micro"), micro(rbar, "rbar_micro"),
        micro(f, "chrf_micro"))
  }

  /** Per-(pair, order) clipped matches and candidate totals, pivoted to
    * one row per pair with `__m1..__m{maxN}` / `__t1..__t{maxN}`.
    */
  private def clippedByOrder(base: DataFrame, idCol: String,
                             maxN: Int): DataFrame = {
    def grams(tcol: String, as: String): DataFrame =
      (1 to maxN).map(n =>
        base.select(col(idCol), lit(n).as("__n"),
          explode(TF.ngrams(col(tcol), n)).as("__g")))
        .reduce(_ unionByName _)
        .groupBy(col(idCol), col("__n"), col("__g")).agg(count(lit(1)).as(as))
    val perOrder = grams("__ct", "__cc")
      .join(grams("__rt", "__rc"), Seq(idCol, "__n", "__g"), "left")
      .groupBy(col(idCol), col("__n"))
      .agg(sum(least(col("__cc"), coalesce(col("__rc"), lit(0L)))).as("__m"),
        sum(col("__cc")).as("__t"))
    val aggs = (1 to maxN).flatMap(n => Seq(
      sum(when(col("__n") === n, col("__m"))).as(s"__m$n"),
      sum(when(col("__n") === n, col("__t"))).as(s"__t$n")))
    perOrder.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }
}
