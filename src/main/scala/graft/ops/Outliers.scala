package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * join back tags every row — the big table is scanned, never shuffled.
  *
  * The exact `percentile` aggregate buffers EVERY value of a group on the
  * task computing it — fine at test scale and engine-exact (matches DuckDB
  * `quantile_cont` bit-for-bit, proven by q43), but an unbounded per-group
  * buffer at 100 TB (~20 M doubles per task at 100× this data). Big-data
  * callers MUST pass `approx = true`: `approx_percentile` is a mergeable
  * bounded-error sketch (Greenwald–Khanna), so per-group state is
  * O(accuracy), constant in data size, and map-side partial merge works.
  * The fences jitter within the sketch's rank-error bound (≤ 1/accuracy of
  * the group's rows); flags stay exact RELATIVE to the fences either way,
  * and OutliersSpec's differential test pins the approx fences to the exact
  * ones within tolerance on real data.
  */
object Outliers {

  /** Per-group Tukey fences + outlier tagging.
    *
    * @param approx    use the `approx_percentile` sketch for the quartiles —
    *                  REQUIRED at large scale (see object doc); default
    *                  stays exact for engine-exact fences at test scale
    * @param accuracy  sketch accuracy knob (rank error ≤ 1/accuracy)
    * @return input rows plus (lo, hi, is_outlier)
    */
  def tagIqr(df: DataFrame, groupCols: Seq[String], valueCol: String,
             k: Double = 1.5, approx: Boolean = false,
             accuracy: Int = 10000): DataFrame = {
    def quart(p: Double) =
      if (approx) percentile_approx(col(valueCol), lit(p), lit(accuracy))
      else percentile(col(valueCol), lit(p))
    val fences = df.groupBy(groupCols.map(col): _*)
      .agg(quart(0.25).as("__q1"), quart(0.75).as("__q3"))
      .select(groupCols.map(col) :+
        (col("__q1") - lit(k) * (col("__q3") - col("__q1"))).as("lo") :+
        (col("__q3") + lit(k) * (col("__q3") - col("__q1"))).as("hi"): _*)
    df.join(broadcast(fences), groupCols)
      .withColumn("is_outlier", col(valueCol) < col("lo") || col(valueCol) > col("hi"))
  }

  /** Per-group robust z-score gate: flag rows with
    * |x − median| / (1.4826·MAD) > k — the median/MAD sibling of [[tagIqr]],
    * preferred when up to half the data may be contaminated (the
    * breakdown point of quartile fences is 25%; MAD's is 50%). 1.4826
    * rescales MAD to σ-equivalents under normality, so k≈3.5 is the
    * conventional gate.
    *
    * Scale shape: TWO passes over the big table (deviations depend on the
    * median — inherent to exact MAD), each a group-cardinality aggregate
    * broadcast back; the table itself never shuffles. A zero MAD (≥50%
    * identical values) yields a null score and `is_outlier = false` —
    * guarded BEFORE the division (ANSI mode throws on /0). Same `approx`
    * knob as [[tagIqr]] for the 100 TB path.
    *
    * @return input rows plus (med, mad, robust_z, is_outlier)
    */
  def tagRobustZ(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 k: Double = 3.5, approx: Boolean = false,
                 accuracy: Int = 10000): DataFrame = {
    def pct(c: Column, p: Double) =
      if (approx) percentile_approx(c, lit(p), lit(accuracy))
      else percentile(c, lit(p))
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(pct(col(valueCol), 0.5).as("med"))
    val withDev = df.join(broadcast(med), groupCols)
      .withColumn("__absdev", abs(col(valueCol) - col("med")))
    val mad = withDev.groupBy(groupCols.map(col): _*)
      .agg(pct(col("__absdev"), 0.5).as("mad"))
    withDev.join(broadcast(mad), groupCols)
      .withColumn("robust_z",
        when(col("mad") === 0, lit(null).cast("double"))
          .otherwise(col("__absdev") / (lit(1.4826) * col("mad"))))
      .withColumn("is_outlier", coalesce(col("robust_z") > k, lit(false)))
      .drop("__absdev")
  }

  /** Per-group winsorization: CLAMP `valueCol` into its [P(lo), P(hi)]
    * percentile band instead of dropping rows — the gentler cleaning gate
    * when downstream aggregates should keep every observation but not let
    * one fat-finger tick dominate a sum. Adds `<valueCol>_w`.
    *
    * Same percentile-aggregate + broadcast-tag shape as [[tagIqr]] (the big
    * table is scanned, never shuffled), and the same `approx` knob is the
    * 100 TB path.
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                lo: Double = 0.01, hi: Double = 0.99,
                approx: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(lo < hi, s"lo=$lo must be below hi=$hi")
    def pct(p: Double) =
      if (approx) percentile_approx(col(valueCol), lit(p), lit(accuracy))
      else percentile(col(valueCol), lit(p))
    val bands = df.groupBy(groupCols.map(col): _*)
      .agg(pct(lo).as("__plo"), pct(hi).as("__phi"))
    df.join(broadcast(bands), groupCols)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("__plo")), col("__phi")))
      .drop("__plo", "__phi")
  }

  /** Per-group outlier summary: row counts and the worst offenders.
    * `approx`/`accuracy` as in [[tagIqr]] — pass `approx = true` at scale.
    */
  def summarizeIqr(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   k: Double = 1.5, approx: Boolean = false,
                   accuracy: Int = 10000): DataFrame =
    tagIqr(df, groupCols, valueCol, k, approx, accuracy)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        min(when(col("is_outlier"), col(valueCol))).as("min_outlier"),
        max(when(col("is_outlier"), col(valueCol))).as("max_outlier"))
}
