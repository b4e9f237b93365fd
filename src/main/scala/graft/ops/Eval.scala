package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-audit operators — the evaluation half every inference
  * pipeline (language ID gates, quality classifiers, topic routers)
  * needs next to its scoring half: once a model labels a corpus slice,
  * the question is "where is it wrong, per class?".
  *
  * Everything derives from ONE (label, predicted) count matrix, so the
  * audit costs one aggregate over the predictions however large the
  * corpus — the matrix itself is |classes|² rows, broadcast-sized
  * algebra after that. All ratios are single IEEE divisions of exact
  * integer counts, micro-quantized — hash-checkable, any engine.
  */
object Eval {

  /** Confusion counts: one row per observed (label, predicted) pair.
    * NULL labels/predictions are excluded (unlabeled rows audit nothing).
    */
  def confusion(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    df.filter(col(labelCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(labelCol).as("label"), col(predCol).as("predicted"))
      .agg(count(lit(1)).as("n"))

  /** Per-class report over the confusion matrix: support (true count),
    * prediction count, correct count, precision / recall / F1 in micro
    * units. Classes appearing only as a PREDICTION (e.g. a classifier
    * emitting a label the corpus never carries, like langId's 'und')
    * still report — with zero support and zero recall — because a class
    * the model hallucinates is exactly what an audit must surface.
    * Undefined ratios (zero denominator) are NULL, never 0 — "no
    * predictions" is not "0% precision".
    *
    * @return (cls, n_true, n_pred, n_correct, precision_micro,
    *         recall_micro, f1_micro)
    */
  def classReport(df: DataFrame, labelCol: String,
                  predCol: String): DataFrame = {
    val m = graft.util.Caches.cache(confusion(df, labelCol, predCol)).toDF
    val cls = m.select(col("label").as("cls"))
      .unionByName(m.select(col("predicted").as("cls"))).distinct()
    val nTrue = m.groupBy(col("label").as("cls"))
      .agg(sum(col("n")).as("__nt"))
    val nPred = m.groupBy(col("predicted").as("cls"))
      .agg(sum(col("n")).as("__np"))
    val tp = m.filter(col("label") === col("predicted"))
      .select(col("label").as("cls"), col("n").as("__tp"))
    def micro(c: org.apache.spark.sql.Column, as: String) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("long").as(as)
    val base = cls
      .join(nTrue, Seq("cls"), "left")
      .join(nPred, Seq("cls"), "left")
      .join(tp, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("__nt"), lit(0L)).as("n_true"),
        coalesce(col("__np"), lit(0L)).as("n_pred"),
        coalesce(col("__tp"), lit(0L)).as("n_correct"))
    val p = when(col("n_pred") === 0, lit(null))
      .otherwise(col("n_correct").cast("double") / col("n_pred").cast("double"))
    val r = when(col("n_true") === 0, lit(null))
      .otherwise(col("n_correct").cast("double") / col("n_true").cast("double"))
    base.select(col("cls"), col("n_true"), col("n_pred"), col("n_correct"),
        micro(p, "precision_micro"), micro(r, "recall_micro"),
        micro(when(p.isNull || r.isNull || (p + r) === 0.0, lit(null))
          .otherwise(lit(2.0) * p * r / (p + r)), "f1_micro"))
  }

  /** Reliability diagram / calibration bins for a probabilistic binary
    * classifier: scores in [0, 1] bucket into `bins` equal-width bins;
    * each bin reports its size, positive count, mean CONFIDENCE (mean
    * score) and mean ACCURACY (positive rate) — the |accuracy −
    * confidence| gap column is the per-bin term of Expected Calibration
    * Error (`ECE = Σ n_b/N · gap_b`, left to the caller as one weighted
    * sum so the bins stay inspectable). A well-calibrated scorer's gaps
    * sit near 0; a confidently-wrong quality gate is exactly what this
    * audit catches before a corpus is filtered with it.
    *
    * Deterministic: scores accumulate as DECIMAL(38,12) (partitioning
    * cannot reorder the mean's sum), counts are exact, and each reported
    * ratio is one IEEE division, micro-quantized. Score exactly 1.0
    * clamps into the top bin. NULL scores/labels are excluded.
    *
    * Scale shape: ONE aggregate at (bin) grain — `bins` rows out,
    * however large the scored corpus.
    *
    * @param labelCol boolean or 0/1 numeric truth column
    * @return (bin, n, n_pos, conf_micro, acc_micro, gap_micro), bins
    *         with no rows absent
    */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2, s"calibration: bins must be >= 2, got $bins")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 12)
    val b = least(floor(col(scoreCol).cast("double") * bins),
      lit(bins - 1)).cast("long")
    def micro(c: org.apache.spark.sql.Column, as: String) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("long").as(as)
    val agg = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(b.as("bin"), col(scoreCol).cast(dec).as("__s"),
        col(labelCol).cast("boolean").cast("int").cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        sum(col("__s")).as("__ss"))
    val conf = col("__ss").cast("double") / col("n").cast("double")
    val acc = col("n_pos").cast("double") / col("n").cast("double")
    agg.select(col("bin"), col("n"), col("n_pos"),
      micro(conf, "conf_micro"), micro(acc, "acc_micro"),
      micro(abs(acc - conf), "gap_micro"))
  }

  private val Dec38 =
    org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)

  /** Per-distinct-score positive/negative counts with running totals —
    * the shared core of [[rocCurve]] and [[rocAuc]]. One aggregate at
    * score grain, then one UNPARTITIONED window ordered by score over
    * the distinct-score rows. The global sort is at DISTINCT-SCORE
    * cardinality, not corpus cardinality — the bounded-distinct-scores
    * contract (model scores are quantized floats; a corpus of any size
    * reduces to at most |score codomain| rows before the sort), the same
    * class as [[Funnels.sequenceMatch]]'s bounded-per-entity contract.
    */
  private def scoreGrain(df: DataFrame, scoreCol: String,
                         labelCol: String): DataFrame = {
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("score"),
        col(labelCol).cast("boolean").cast("int").cast("long").as("__y"))
      .groupBy(col("score"))
      .agg(sum(col("__y")).as("pos_at"),
        (count(lit(1)) - sum(col("__y"))).as("neg_at"))
      .withColumn("cum_pos", sum(col("pos_at")).over(w))
      .withColumn("cum_neg", sum(col("neg_at")).over(w))
  }

  /** ROC curve at distinct-score grain: one row per threshold (each
    * observed score, predicting positive when `score >= threshold`),
    * with exact cumulative counts and micro-quantized TPR / FPR. Rows
    * order from the strictest threshold down — the usual (0,0)→(1,1)
    * sweep. All counts exact integers; each rate is ONE double division,
    * micro-quantized — hash-checkable anywhere.
    *
    * @return (threshold, tp, fp, tpr_micro, fpr_micro)
    */
  def rocCurve(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = scoreGrain(df, scoreCol, labelCol)
    def micro(c: org.apache.spark.sql.Column, as: String) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("long").as(as)
    // one-row totals broadcast onto the curve rows (house scalar-attach)
    val tot = g.agg(sum(col("pos_at")).as("__p"), sum(col("neg_at")).as("__n"))
    g.crossJoin(broadcast(tot))
      .select(col("score").as("threshold"),
        (col("__p") - col("cum_pos") + col("pos_at")).as("tp"),
        (col("__n") - col("cum_neg") + col("neg_at")).as("fp"),
        col("__p"), col("__n"))
      .select(col("threshold"), col("tp"), col("fp"),
        micro(when(col("__p") === 0, lit(null))
          .otherwise(col("tp").cast("double") / col("__p").cast("double")),
          "tpr_micro"),
        micro(when(col("__n") === 0, lit(null))
          .otherwise(col("fp").cast("double") / col("__n").cast("double")),
          "fpr_micro"))
  }

  /** Exact ROC-AUC via the rank statistic (Mann–Whitney U with the
    * standard tie mid-rank correction): over distinct scores s,
    * `U·2 = Σ pos_at(s) · (2·neg_below(s) + neg_at(s))`, and
    * `AUC = U·2 / (2·P·N)` — a tied positive/negative pair counts ½.
    * This IS the trapezoid area under [[rocCurve]], computed without
    * floating intermediates: every product forms in DECIMAL(38,0)
    * BEFORE multiplying (at 100 TB grain `pos_at · neg_below` passes
    * Long past ~3e9 rows per side — the [[Drift.ksDrift]] overflow
    * class), one IEEE division at the end, micro-quantized. Degenerate
    * corpora (no positives or no negatives) report NULL, never 0 — "AUC
    * undefined" is not "worst classifier".
    *
    * Scale shape: one score-grain aggregate + one bounded window (see
    * [[scoreGrain]]) + one one-row aggregate. The corpus shuffles once.
    *
    * @return one row: (n_pos, n_neg, auc_micro)
    */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = scoreGrain(df, scoreCol, labelCol)
    val negBelow = (col("cum_neg") - col("neg_at")).cast(Dec38)
    val u2 = sum(col("pos_at").cast(Dec38) *
      (negBelow * lit(2).cast(Dec38) + col("neg_at").cast(Dec38)))
    val agg = g.agg(sum(col("pos_at")).as("n_pos"),
      sum(col("neg_at")).as("n_neg"), u2.as("__u2"))
    agg.select(col("n_pos"), col("n_neg"),
      floor(when(col("n_pos") === 0 || col("n_neg") === 0, lit(null))
        .otherwise(col("__u2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")))
        * lit(1000000.0) + lit(0.5)).cast("long").as("auc_micro"))
  }

  /** Platt scaling (Platt 1999) — the calibration FIX that follows
    * [[calibration]]'s audit: fit `p = σ(a·s + b)` to the (score, label)
    * data by FIXED-round CLIPPED Newton on the logistic NLL, so a
    * confidently-wrong gate's scores can be remapped before the corpus
    * is filtered with them. Fixed rounds + fixed (0, 0) start + each
    * step component clipped to ±1 = deterministic and replayable; the
    * clip is what tames Newton's classic overshoot on near-separable
    * data (the unclipped MLE diverges as separation sharpens — measured:
    * a 95/5 separated corpus sent unguarded steps to a ≈ −126), while
    * near the optimum Newton's quadratic steps are far inside the clip,
    * so 8 rounds resolve any realistic calibration slope.
    *
    * Each round is ONE aggregate over the DISTINCT-SCORE grain (the
    * [[scoreGrain]] bounded-codomain contract): gradient and Hessian
    * terms are fixed IEEE trees per score row, NANO-floored before the
    * decimal sums (commuting integers); the 2×2 solve runs driver-side
    * on the collected one-row sums (bounded metadata). A near-singular
    * Hessian stops the iteration (parameters keep their last value)
    * rather than dividing by ~0. Probabilities clamp to
    * [1e-15, 1 − 1e-15] (replayable literals) so the NLL never meets a
    * log of 0.
    *
    * @return one row: (n, n_pos, a_micro, b_micro, nll_nano — final
    *         per-observation negative log-likelihood)
    */
  def plattFit(df: DataFrame, scoreCol: String, labelCol: String,
               iters: Int = 8): DataFrame = {
    require(iters >= 1, s"plattFit: iters must be >= 1, got $iters")
    val g = graft.util.Caches.cache(
      df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
        .select(col(scoreCol).cast("double").as("s"),
          col(labelCol).cast("boolean").cast("int").cast("long").as("__y"))
        .groupBy(col("s"))
        .agg(count(lit(1)).as("n"), sum(col("__y")).as("y"))).toDF
    def nano(term: org.apache.spark.sql.Column) =
      sum(floor(term * lit(1e9) + lit(0.5)).cast("long").cast(Dec38))
    def p(a: Double, b: Double): org.apache.spark.sql.Column = {
      val z = lit(a) * col("s") + lit(b)
      val sig = lit(1.0) / (lit(1.0) + exp(-z))
      least(greatest(sig, lit(1e-15)), lit(1.0 - 1e-15))
    }
    var (a, b) = (0.0, 0.0)
    for (_ <- 1 to iters) {
      val pc = p(a, b)
      val w = col("n").cast("double") * pc * (lit(1.0) - pc)
      val r = g.agg(
        nano(pc * col("n").cast("double") - col("y").cast("double")).as("g1"),
        nano(col("s") * (pc * col("n").cast("double") -
          col("y").cast("double"))).as("g2"),
        nano(w).as("h11"), nano(col("s") * w).as("h12"),
        nano(col("s") * col("s") * w).as("h22")).collect().head
      def d(i: Int): Double = r.getDecimal(i).doubleValue() / 1e9
      val (g1, g2, h11, h12, h22) = (d(0), d(1), d(2), d(3), d(4))
      val det = h11 * h22 - h12 * h12
      if (math.abs(det) > 1e-12) {
        def clip(x: Double) = math.min(math.max(x, -1.0), 1.0)
        // H = [[h22, h12], [h12, h11]] in (a, b) order: Δa uses h11,
        // Δb uses h22 — the mixed terms share h12
        a -= clip((g2 * h11 - g1 * h12) / det)
        b -= clip((g1 * h22 - g2 * h12) / det)
      }
    }
    val pf = p(a, b)
    g.agg(sum(col("n")).as("n"), sum(col("y")).as("n_pos"),
        nano(-(col("y").cast("double") * log(pf) +
          (col("n") - col("y")).cast("double") * log(lit(1.0) - pf)))
          .as("__nll"))
      .select(col("n"), col("n_pos"),
        lit(math.floor(a * 1e6 + 0.5).toLong).as("a_micro"),
        lit(math.floor(b * 1e6 + 0.5).toLong).as("b_micro"),
        floor(col("__nll").cast("double") /
          col("n").cast("double") + lit(0.5)).cast("long").as("nll_nano"))
  }

  /** Ranking-quality metrics per query — the RETRIEVAL evaluation half
    * next to the classifier half ([[classReport]]/[[rocAuc]]): given a
    * RUN (query, doc, 1-based rank — any retrieval tier's top-k output)
    * and graded RELEVANCE judgments, report MRR, NDCG@k, precision@k and
    * recall@k. The numbers that decide whether a BM25/ANN/RRF/MMR stack
    * change actually helped.
    *
    *  - MRR: 1/rank of the first relevant hit (0 if none in the top k).
    *  - DCG@k: `Σ rel_r / log2(r+1)` — log2 expanded as `ln(x)/ln 2`
    *    with the ln 2 constant INLINED as a double literal on both engines
    *    (a native log2 may differ from ln/ln2 by an ulp across libms);
    *    IDCG@k from the query's judgments
    *    sorted by relevance (best possible ordering); NDCG = DCG/IDCG,
    *    NULL when the query has no relevant docs (undefined ≠ 0).
    *  - precision@k counts relevant retrieved over k; recall@k over the
    *    query's total relevant count.
    *
    * Determinism: counts exact; DCG/IDCG terms are one division each,
    * NANO-quantized before their (≤ k-term) sums — partitioning cannot
    * reorder them; each reported ratio is a single IEEE division,
    * micro-quantized. Unjudged retrieved docs count relevance 0 (the
    * standard pooling convention).
    *
    * Scale shape: the run is top-k-bounded (|queries|·k rows); judgments
    * join at (query, doc) grain; the IDCG window sorts per query over
    * its JUDGED docs only (bounded-judgments contract). The corpus never
    * appears.
    *
    * @param runs  (queryCol, docCol, rankCol) — one row per retrieved
    *              doc per query (ranked lists are unique by construction;
    *              a duplicated (query, doc) row would double-count)
    * @param qrels (queryCol, docCol, relCol) — graded, 0/NULL = irrelevant;
    *              one judgment per (query, doc)
    * @return (queryCol, n_rel, n_hits, mrr_micro, ndcg_micro,
    *         p_at_k_micro, recall_micro)
    */
  def rankMetrics(runs: DataFrame, qrels: DataFrame, queryCol: String,
                  docCol: String, rankCol: String, relCol: String,
                  k: Int): DataFrame = {
    require(k >= 1, s"rankMetrics: k must be >= 1, got $k")
    def micro(c: org.apache.spark.sql.Column, as: String) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("long").as(as)
    def nano(term: org.apache.spark.sql.Column) =
      sum(floor(term * lit(1e9) + lit(0.5)).cast("long"))
    val ln2 = lit(math.log(2.0))
    def log2c(x: org.apache.spark.sql.Column) = log(x) / ln2
    val rels = qrels.filter(col(relCol).isNotNull && col(relCol) > 0)
      .select(col(queryCol), col(docCol), col(relCol).cast("double").as("__rel"))
    // per-query relevant universe + ideal DCG (best-first ordering)
    val iw = Window.partitionBy(col(queryCol))
      .orderBy(col("__rel").desc, col(docCol))
    val ideal = rels
      .withColumn("__ir", row_number().over(iw))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_rel"),
        nano(when(col("__ir") <= k,
          col("__rel") / log2c(col("__ir").cast("double") + lit(1.0)))
          .otherwise(lit(0.0))).as("__idcg_nano"))
    val got = runs.filter(col(rankCol) <= k)
      .join(rels, Seq(queryCol, docCol), "left")
      .withColumn("__r", coalesce(col("__rel"), lit(0.0)))
      .groupBy(col(queryCol))
      .agg(
        nano(col("__r") / log2c(col(rankCol).cast("double") + lit(1.0)))
          .as("__dcg_nano"),
        sum(when(col("__r") > 0, lit(1L)).otherwise(lit(0L))).as("n_hits"),
        min(when(col("__r") > 0, col(rankCol).cast("long"))).as("__first"))
    got.join(ideal, Seq(queryCol), "left")
      .select(col(queryCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"), col("n_hits"),
        micro(when(col("__first").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("__first").cast("double")), "mrr_micro"),
        micro(when(col("__idcg_nano").isNull || col("__idcg_nano") === 0,
          lit(null))
          .otherwise(col("__dcg_nano").cast("double") /
            col("__idcg_nano").cast("double")), "ndcg_micro"),
        micro(col("n_hits").cast("double") / lit(k.toDouble), "p_at_k_micro"),
        micro(when(coalesce(col("n_rel"), lit(0L)) === 0, lit(null))
          .otherwise(col("n_hits").cast("double") / col("n_rel").cast("double")),
          "recall_micro"))
  }

  /** Average precision (PR-AUC) with ties processed as BLOCKS: sweeping
    * thresholds from the strictest down, each distinct score contributes
    * `pos_at(s) · precision@cut(s)`, where the cut includes the whole tie
    * block — `AP = Σ_s pos_at·(cum_tp/cum_n) / P` (the step-wise AP
    * retrieval evaluation uses; block semantics make it tie-order-free).
    * Class-imbalance-honest where ROC-AUC is not: a screen for a 0.1%
    * positive class can hold AUC ≈ 0.99 while AP collapses — run both.
    *
    * Determinism: per-block terms are exact-integer products quantized to
    * NANO units after their single division, then summed in DECIMAL
    * (integer-grain addition commutes — the [[Drift.psiDrift]] pattern),
    * one final division by P. No positives → NULL, never 0.
    *
    * Scale shape: same as [[rocAuc]] — one score-grain aggregate, one
    * bounded window, one one-row aggregate.
    *
    * @return one row: (n_pos, n_neg, ap_micro)
    */
  def averagePrecision(df: DataFrame, scoreCol: String,
                       labelCol: String): DataFrame = {
    val g = scoreGrain(df, scoreCol, labelCol)
    val tot = g.agg(sum(col("pos_at")).as("__p"), sum(col("neg_at")).as("__n"))
    // descending-threshold cumulatives from the ascending ones the grain
    // carries: cum_tp(s) = P − cum_pos(s) + pos_at(s), same for n
    val cumTp = col("__p") - col("cum_pos") + col("pos_at")
    val cumN = cumTp + (col("__n") - col("cum_neg") + col("neg_at"))
    val termNano = floor(col("pos_at").cast("double") *
      (cumTp.cast("double") / cumN.cast("double")) *
      lit(1000000000.0) + lit(0.5)).cast(Dec38)
    g.crossJoin(broadcast(tot))
      .agg(max(col("__p")).as("n_pos"), max(col("__n")).as("n_neg"),
        sum(termNano).as("__ap_nano"))
      .select(col("n_pos"), col("n_neg"),
        floor(when(col("n_pos") === 0, lit(null))
          .otherwise(col("__ap_nano").cast("double") / lit(1000000000.0) /
            col("n_pos").cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long").as("ap_micro"))
  }

  /** Precision–recall curve at distinct-score grain — [[rocCurve]]'s
    * class-imbalance-honest sibling (and the curve [[averagePrecision]]
    * summarizes): one row per threshold (predict positive when
    * `score >= threshold`), exact tp/fp counts, micro-quantized
    * precision and recall. Precision's denominator is never 0 (every
    * observed threshold retains at least its own tie block); recall is
    * NULL on a positives-free corpus, never 0.
    *
    * Scale shape: identical to [[rocCurve]] — one score-grain aggregate,
    * one bounded-codomain window, one-row totals broadcast on.
    *
    * @return (threshold, tp, fp, precision_micro, recall_micro)
    */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = scoreGrain(df, scoreCol, labelCol)
    def micro(c: org.apache.spark.sql.Column, as: String) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("long").as(as)
    val tot = g.agg(sum(col("pos_at")).as("__p"), sum(col("neg_at")).as("__n"))
    g.crossJoin(broadcast(tot))
      .select(col("score").as("threshold"),
        (col("__p") - col("cum_pos") + col("pos_at")).as("tp"),
        (col("__n") - col("cum_neg") + col("neg_at")).as("fp"),
        col("__p"))
      .select(col("threshold"), col("tp"), col("fp"),
        micro(col("tp").cast("double") /
          (col("tp") + col("fp")).cast("double"), "precision_micro"),
        micro(when(col("__p") === 0, lit(null))
          .otherwise(col("tp").cast("double") / col("__p").cast("double")),
          "recall_micro"))
  }

  /** Brier score with the Murphy (1973) reliability–resolution–
    * uncertainty decomposition — the calibration audit's scalar summary:
    * `brier = reliability − resolution + uncertainty` over `bins`
    * equal-width score bins (up to binning error on the exact term,
    * which is reported separately from the DIRECT per-row mean so the
    * decomposition's approximation is itself visible).
    *
    *  - brier: mean (s − y)² — per-row terms NANO-floored before the
    *    decimal sum (commuting integers), one division.
    *  - reliability: Σ n_b·(conf_b − acc_b)²/N — how far each bin's
    *    confidence sits from its accuracy (what [[calibration]] plots).
    *  - resolution: Σ n_b·(acc_b − ȳ)²/N — how much the bins separate
    *    the base rate (higher = more informative scorer).
    *  - uncertainty: ȳ·(1 − ȳ) — the corpus' irreducible term.
    *
    * Bin means are single IEEE divisions of exact sums; per-bin terms
    * nano-floor before the (≤ bins)-row sum. Scores must live in [0, 1]
    * (the [[calibration]] contract; 1.0 clamps into the top bin).
    *
    * @return one row: (n, n_pos, brier_nano, reliability_nano,
    *         resolution_nano, uncertainty_nano)
    */
  def brierDecomposition(df: DataFrame, scoreCol: String, labelCol: String,
                         bins: Int = 10): DataFrame = {
    require(bins >= 2, s"brierDecomposition: bins must be >= 2, got $bins")
    val b = least(floor(col(scoreCol).cast("double") * bins),
      lit(bins - 1)).cast("long")
    def nanoSum(term: org.apache.spark.sql.Column) =
      sum(floor(term * lit(1e9) + lit(0.5)).cast("long").cast(Dec38))
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 12)
    val perBin = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(b.as("__b"), col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("boolean").cast("int").cast("long").as("__y"))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__nb"), sum(col("__y")).as("__pb"),
        sum(col("__s").cast(dec)).as("__ssb"),
        nanoSum((col("__s") - col("__y").cast("double")) *
          (col("__s") - col("__y").cast("double"))).as("__sq"))
    val tot = perBin.agg(sum(col("__nb")).as("__n"), sum(col("__pb")).as("__p"))
    val conf = col("__ssb").cast("double") / col("__nb").cast("double")
    val acc = col("__pb").cast("double") / col("__nb").cast("double")
    val base = col("__p").cast("double") / col("__n").cast("double")
    perBin.crossJoin(broadcast(tot))
      .agg(max(col("__n")).as("n"), max(col("__p")).as("n_pos"),
        sum(col("__sq")).as("__sqs"),
        nanoSum(col("__nb").cast("double") * (conf - acc) * (conf - acc))
          .as("__rel"),
        nanoSum(col("__nb").cast("double") * (acc - base) * (acc - base))
          .as("__res"),
        max(floor(base * (lit(1.0) - base) * lit(1e9) + lit(0.5))
          .cast("long")).as("uncertainty_nano"))
      .select(col("n"), col("n_pos"),
        floor(col("__sqs").cast("double") / col("n").cast("double") +
          lit(0.5)).cast("long").as("brier_nano"),
        floor(col("__rel").cast("double") / col("n").cast("double") +
          lit(0.5)).cast("long").as("reliability_nano"),
        floor(col("__res").cast("double") / col("n").cast("double") +
          lit(0.5)).cast("long").as("resolution_nano"),
        col("uncertainty_nano"))
  }

  /** Logarithmic loss (binary cross-entropy) of a probabilistic scorer:
    * mean `−(y·ln p + (1−y)·ln(1−p))` with p clamped to the replayable
    * [1e-15, 1 − 1e-15] literals (the [[plattFit]] convention — the loss
    * never meets ln 0). Per-row terms NANO-floored before the decimal
    * sum, ONE division. The proper-scoring companion to
    * [[brierDecomposition]]: log-loss punishes confident wrongness
    * without bound, Brier caps it — a gate that fails one and not the
    * other is overconfident in its tails.
    *
    * @return one row: (n, n_pos, logloss_nano — per-observation nats)
    */
  def logLoss(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val p0 = col(scoreCol).cast("double")
    val p = least(greatest(p0, lit(1e-15)), lit(1.0 - 1e-15))
    def nanoSum(term: org.apache.spark.sql.Column) =
      sum(floor(term * lit(1e9) + lit(0.5)).cast("long").cast(Dec38))
    df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(p.as("__p"),
        col(labelCol).cast("boolean").cast("int").cast("long").as("__y"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        nanoSum(-(col("__y").cast("double") * log(col("__p")) +
          (lit(1L) - col("__y")).cast("double") *
            log(lit(1.0) - col("__p")))).as("__ll"))
      .select(col("n"), col("n_pos"),
        floor(col("__ll").cast("double") / col("n").cast("double") +
          lit(0.5)).cast("long").as("logloss_nano"))
  }

  /** Cohen's kappa — chance-corrected agreement between labels and
    * predictions: `κ = (p_o − p_e)/(1 − p_e)` with observed agreement
    * `p_o = Σ_c n_cc / N` and chance agreement
    * `p_e = Σ_c (row_c/N)·(col_c/N)`. The number [[classReport]]'s raw
    * accuracy overstates on skewed corpora (a 95%-one-class corpus gives
    * any constant predictor 95% accuracy but κ = 0).
    *
    * Exact: margins and the diagonal come from the ONE confusion-matrix
    * aggregate; the p_e numerator forms in DECIMAL (row·col products
    * pass Long at corpus scale); p_o, p_e are single IEEE divisions and
    * κ one fixed tree of them, micro-quantized. Degenerate p_e = 1
    * (both sides constant) reports NULL, never 0.
    *
    * @return one row: (n, po_micro, pe_micro, kappa_micro)
    */
  def cohenKappa(df: DataFrame, labelCol: String,
                 predCol: String): DataFrame = {
    val m = graft.util.Caches.cache(confusion(df, labelCol, predCol)).toDF
    val rows = m.groupBy(col("label").as("cls")).agg(sum(col("n")).as("__r"))
    val cols = m.groupBy(col("predicted").as("cls")).agg(sum(col("n")).as("__c"))
    val diag = m.filter(col("label") === col("predicted"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("__d"))
    val tot = m.agg(sum(col("n")).as("__n"))
    val peNum = rows.join(cols, Seq("cls"))
      .agg(coalesce(sum(col("__r").cast(Dec38) * col("__c").cast(Dec38)),
        lit(0).cast(Dec38)).as("__pe_num"))
    val po = col("__d").cast("double") / col("__n").cast("double")
    val pe = col("__pe_num").cast("double") /
      (col("__n").cast("double") * col("__n").cast("double"))
    def micro(c: org.apache.spark.sql.Column, as: String) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("long").as(as)
    tot.crossJoin(diag).crossJoin(peNum)
      .select(col("__n").as("n"), micro(po, "po_micro"), micro(pe, "pe_micro"),
        micro(when(pe === 1.0, lit(null))
          .otherwise((po - pe) / (lit(1.0) - pe)), "kappa_micro"))
  }

  /** Fleiss' kappa — chance-corrected agreement among MANY raters
    * ([[cohenKappa]] handles exactly two sides): over assignments
    * `(item, rater-assigned category)` with a CONSTANT `n` raters per
    * item, `κ = (P̄ − P̄e)/(1 − P̄e)` with per-item agreement
    * `P_i = (Σ_j n_ij² − n)/(n(n−1))` and chance agreement
    * `P̄e = Σ_j p_j²`. The multi-annotator QA number a labeling
    * campaign gates on before its labels train anything.
    *
    * Exact core: ONE (item, category) count aggregate; Σn_ij² forms in
    * DECIMAL; each P_i is a fixed tree of exact integers NANO-floored
    * before the item sum (commuting integers); p_j and their squares
    * nano-floor at category grain (bounded). `raters_constant` reports
    * whether every item saw the same rater count — when false, κ is
    * NULL (Fleiss is undefined; fix the panel, don't average over the
    * hole). Items with one rater (n ≤ 1) make P_i undefined → NULL κ
    * likewise.
    *
    * @param df one row per (item, single rater's category) assignment
    * @return one row: (n_items, n_raters, raters_constant, pbar_micro,
    *         pe_micro, kappa_micro)
    */
  def fleissKappa(df: DataFrame, itemCol: String,
                  catCol: String): DataFrame = {
    def micro(c: org.apache.spark.sql.Column, as: String) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("long").as(as)
    val cells = graft.util.Caches.cache(
      df.filter(col(itemCol).isNotNull && col(catCol).isNotNull)
        .groupBy(col(itemCol).as("__it"), col(catCol).as("__cat"))
        .agg(count(lit(1)).as("__nij"))).toDF
    val items = cells.groupBy(col("__it"))
      .agg(sum(col("__nij")).as("__n"),
        sum(col("__nij").cast(Dec38) * col("__nij").cast(Dec38)).as("__sq"))
    val panel = items.agg(count(lit(1)).as("n_items"),
      min(col("__n")).as("__nmin"), max(col("__n")).as("__nmax"))
    // per-item P_i nano-floored, then the decimal item sum
    val pbarNano = items.crossJoin(broadcast(panel))
      .filter(col("__n") === col("__nmax") && col("__nmax") > 1)
      .select(floor((col("__sq").cast("double") - col("__n").cast("double")) /
        (col("__n").cast("double") * (col("__n").cast("double") - lit(1.0))) *
        lit(1e9) + lit(0.5)).cast("long").cast(Dec38).as("__pi"))
      // the mean divides by the COUNT OF CONTRIBUTING items, not n_items:
      // on a non-constant panel the two differ and dividing by n_items
      // understates the diagnostic (review fix r16); on a constant panel
      // they coincide, so the oracle replay is unchanged there
      .agg(coalesce(sum(col("__pi")), lit(0).cast(Dec38)).as("__pbar_nano"),
        count(lit(1)).as("__pbar_n"))
    // category shares over the full assignment mass
    val totAssign = cells.agg(sum(col("__nij")).as("__tot"))
    val peNano = cells.groupBy(col("__cat"))
      .agg(sum(col("__nij")).as("__cj"))
      .crossJoin(broadcast(totAssign))
      .select(floor((col("__cj").cast("double") / col("__tot").cast("double")) *
        (col("__cj").cast("double") / col("__tot").cast("double")) *
        lit(1e9) + lit(0.5)).cast("long").cast(Dec38).as("__pj2"))
      .agg(coalesce(sum(col("__pj2")), lit(0).cast(Dec38)).as("__pe_nano"))
    val pbar = when(col("__pbar_n") === 0, lit(null))
      .otherwise(col("__pbar_nano").cast("double") / lit(1e9) /
        col("__pbar_n").cast("double"))
    val pe = col("__pe_nano").cast("double") / lit(1e9)
    val constant = col("__nmin") === col("__nmax")
    panel.crossJoin(pbarNano).crossJoin(peNano)
      .select(col("n_items"), col("__nmax").as("n_raters"),
        constant.as("raters_constant"),
        micro(pbar, "pbar_micro"), micro(pe, "pe_micro"),
        micro(when(!constant || col("__nmax") <= 1 || pe === 1.0, lit(null))
          .otherwise((pbar - pe) / (lit(1.0) - pe)), "kappa_micro"))
  }
}
