package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-based outlier detection — the data-cleaning gate a financial
  * pipeline runs before aggregating (the reference trusts yfinance; a real
  * feed needs fat-finger filtering) and an LLM corpus runs on document
  * statistics (length, repetition) before training.
  *
  * Tukey's fences: a value outside [q1 − k·IQR, q3 + k·IQR] is an outlier.
  * Quartiles use Spark's exact `percentile` aggregate — linear-interpolated,
  * matching DuckDB `quantile_cont` bit-for-bit (proven by q43), so the
  * bounds and therefore the flags are engine-exact.
  *
  * Scale shape: quartiles are one hash-aggregate over the group key (the
  * per-key fence table is group-cardinality-sized, tiny), then a broadcast
  * join back tags every row — the big table is scanned, never shuffled. The
  * exact percentile aggregate buffers each group's values; at 100 TB swap in
  * `approx_percentile` (same call shape, sketch-mergeable, constant memory)
  * and accept fence jitter — flags stay exact relative to the fences either
  * way.
  */
object Outliers {

  /** Per-group Tukey fences + outlier tagging.
    *
    * @return input rows plus (lo, hi, is_outlier)
    */
  def tagIqr(df: DataFrame, groupCols: Seq[String], valueCol: String,
             k: Double = 1.5): DataFrame = {
    val fences = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(col(valueCol), lit(0.25)).as("__q1"),
           percentile(col(valueCol), lit(0.75)).as("__q3"))
      .select(groupCols.map(col) :+
        (col("__q1") - lit(k) * (col("__q3") - col("__q1"))).as("lo") :+
        (col("__q3") + lit(k) * (col("__q3") - col("__q1"))).as("hi"): _*)
    df.join(broadcast(fences), groupCols)
      .withColumn("is_outlier", col(valueCol) < col("lo") || col(valueCol) > col("hi"))
  }

  /** Per-group outlier summary: row counts and the worst offenders. */
  def summarizeIqr(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   k: Double = 1.5): DataFrame =
    tagIqr(df, groupCols, valueCol, k)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        min(when(col("is_outlier"), col(valueCol))).as("min_outlier"),
        max(when(col("is_outlier"), col(valueCol))).as("max_outlier"))
}
