package graft.ops

import org.apache.spark.sql.DataFrame
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
}
