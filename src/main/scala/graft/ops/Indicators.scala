package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rolling technical indicators beyond the reference's moving average
  * (/root/reference/transformation.py — the reference computes a simple MA;
  * Bollinger bands and RSI are its two standard companions on the same
  * (key, time, value) bar model).
  *
  * Determinism contract: every windowed SUM runs over exact decimals (the
  * [[graft.util.Num]] trick), so the sums are partition-order- and
  * engine-independent; the remaining arithmetic is a FIXED sequence of
  * double ops mirrored verbatim in the DuckDB oracle, then rounded. No
  * stddev/variance builtin is used — Welford-style accumulation is
  * float-order-dependent and would break the hash compare.
  *
  * Scale shape: one shuffle per key + in-partition sort; all windows share
  * the same (partition, order) so Catalyst plans ONE exchange and one sort.
  * Indicator state is O(window), never O(series).
  */
object Indicators {

  private val Sq: DecimalType = DecimalType(38, 6)

  /** Bollinger bands: trailing-n mean ± `width` sample standard deviations.
    *
    * Variance uses the sum-of-squares identity (Σx² − (Σx)²/n)/(n−1) on
    * EXACT decimal sums — deterministic where a streaming variance is not;
    * the float cancellation in the subtraction is identical on both engines
    * (clamped at 0 for the all-equal-values case). Bands emit only on a
    * full window (the first n−1 rows get nulls — standard chart semantics).
    *
    * @return input + (mid, sd, upper, lower), each rounded to 6
    */
  def bollinger(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
                valueCol: String, n: Int, width: Double = 2.0): DataFrame = {
    require(n >= 2, s"bollinger needs n >= 2, got $n")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(-(n - 1), Window.currentRow)
    // count NON-NULL values: a null in the window must invalidate the band
    // (sum would skip it while a row count still claimed a full window)
    val cnt = count(col(valueCol)).over(w)
    val s1 = sum(col(valueCol).cast(graft.util.Num.Money)).over(w).cast("double")
    val s2 = sum((col(valueCol) * col(valueCol)).cast(Sq)).over(w).cast("double")
    val nn = cnt.cast("double")
    val mid = s1 / nn
    val sd = sqrt(greatest((s2 - s1 * s1 / nn) / (nn - lit(1.0)), lit(0.0)))
    def full(c: Column): Column = when(cnt === n, round(c, 6))
    df.withColumn("mid", full(mid))
      .withColumn("sd", full(sd))
      .withColumn("upper", full(mid + lit(width) * sd))
      .withColumn("lower", full(mid - lit(width) * sd))
  }

  /** Relative Strength Index over the trailing `n` deltas:
    * RSI = 100·Σgain / (Σgain + Σloss) — algebraically the classic
    * 100 − 100/(1+RS) with simple (not Wilder-smoothed) averages, but with
    * ONE division so the guard set is just Σgain+Σloss = 0 (flat window →
    * null; a pure up-window is 100, pure down 0). Emitted only once n
    * deltas exist (the first row of a key has no delta).
    *
    * @return input + (rsi) rounded to 6
    */
  def rsi(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
          valueCol: String, n: Int): DataFrame = {
    require(n >= 1, s"rsi needs n >= 1, got $n")
    val ord = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    val frame = ord.rowsBetween(-(n - 1), Window.currentRow)
    // the delta must materialize in its own projection — a lag() inside a
    // windowed sum would be a (disallowed) nested window expression
    val withDelta = df.withColumn("__delta",
      col(valueCol) - lag(col(valueCol), 1).over(ord))
    val gain = when(col("__delta").isNotNull, greatest(col("__delta"), lit(0.0)))
    val loss = when(col("__delta").isNotNull, greatest(-col("__delta"), lit(0.0)))
    val sg = sum(gain.cast(graft.util.Num.Money)).over(frame).cast("double")
    val sl = sum(loss.cast(graft.util.Num.Money)).over(frame).cast("double")
    val nDeltas = count(gain).over(frame)
    withDelta.withColumn("rsi",
        when(nDeltas === n && sg + sl > 0, round(lit(100.0) * sg / (sg + sl), 6)))
      .drop("__delta")
  }

  /** Trailing-n Pearson correlation between two columns, from the exact
    * five-moment identity — NEVER Spark's `corr` aggregate, whose
    * streaming accumulation is float-order-dependent and would break the
    * hash gate (same reasoning as `Aggregates.pairwiseCorr`, q91, here in
    * windowed form). Emitted only on full windows with positive variance
    * on both sides (a constant series has no defined correlation → null).
    *
    * @return input + (`as` rounded to 6)
    */
  def rollingCorr(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
                  xCol: String, yCol: String, n: Int,
                  as: String = "corr"): DataFrame = {
    require(n >= 2, s"rollingCorr needs n >= 2, got $n")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(-(n - 1), Window.currentRow)
    val x = col(xCol)
    val y = col(yCol)
    // pairwise-complete: a row with either side null contributes nothing
    val both = x.isNotNull && y.isNotNull
    def m(c: Column, t: DecimalType) = sum(when(both, c).cast(t)).over(w).cast("double")
    val cnt = count(when(both, lit(1))).over(w).cast("double")
    val sx = m(x, graft.util.Num.Money)
    val sy = m(y, graft.util.Num.Money)
    val sxy = m(x * y, Sq)
    val sxx = m(x * x, Sq)
    val syy = m(y * y, Sq)
    val num = cnt * sxy - sx * sy
    val vx = greatest(cnt * sxx - sx * sx, lit(0.0))
    val vy = greatest(cnt * syy - sy * sy, lit(0.0))
    df.withColumn(as,
      when(cnt === n && vx > 0 && vy > 0, round(num / sqrt(vx * vy), 6)))
  }

  /** MACD (moving average convergence/divergence): fast EMA − slow EMA,
    * plus a signal EMA over the MACD line. ONE ordered collect per key
    * and three native linear scans
    * ([[graft.functions.expressions.EmaScan]]) — not three separate
    * [[graft.ops.Windows.ema]] passes (each would re-shuffle and
    * re-collect the series), and not the O(series²) `aggregate` +
    * `concat` folds this replaced (ADVICE r9). Alphas default to exact
    * binary fractions (1/4, 1/16, 1/2) so `1 − α` is bit-identical in
    * every engine that parses the literal — the property that lets the
    * full recursive series hash-match the DuckDB oracle (q137). Rounding
    * happens only at the OUTPUT: the signal scan runs over unrounded
    * MACD values.
    *
    * Scale shape: like [[graft.ops.Windows.ema]], one shuffle by key and
    * per-key O(series) scan — per-key series must fit a task (ticks per
    * instrument do; the alternative windowed restatement has no exact
    * recursive form).
    *
    * @return keys ++ orderCols ++ (valueCol, macd, signal)
    */
  def macd(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
           valueCol: String, fastAlpha: Double = 0.25,
           slowAlpha: Double = 0.0625, signalAlpha: Double = 0.5): DataFrame = {
    import graft.functions.expressions.EmaScan
    val grouped = df.groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(
        struct(orderCols.map(col): _*).as("__o"),
        col(valueCol).as("__v")))).as("__s"))
    val vals = transform(col("__s"), _.getField("__v").cast("double"))
    val macdLine = zip_with(EmaScan(vals, fastAlpha), EmaScan(vals, slowAlpha),
      (f, sl) => f - sl)
    grouped
      .withColumn("__m", macdLine)
      .withColumn("__g", EmaScan(col("__m"), signalAlpha))
      .select((keys.map(col) :+
        posexplode(arrays_zip(col("__s"), col("__m"), col("__g")))
          .as(Seq("__i", "__z"))): _*)
      .select((keys.map(col) ++
        orderCols.map(o => col(s"__z.__s.__o.$o").as(o)) ++
        Seq(col("__z.__s.__v").as(valueCol),
          round(col("__z.__m"), 6).as("macd"),
          round(col("__z.__g"), 6).as("signal"))): _*)
  }

  /** Rolling beta of `yCol` on `xCol` (cov/var over the trailing n rows)
    * — the hedge-ratio / market-sensitivity companion to
    * [[rollingCorr]], from the same five exact-decimal window moments
    * minus one: β = (nΣxy − ΣxΣy) / (nΣxx − (Σx)²). Null on partial
    * windows and zero-variance x, like rollingCorr.
    */
  def rollingBeta(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
                  xCol: String, yCol: String, n: Int,
                  as: String = "beta"): DataFrame = {
    require(n >= 2, s"rollingBeta needs n >= 2, got $n")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(-(n - 1), Window.currentRow)
    val x = col(xCol)
    val y = col(yCol)
    val both = x.isNotNull && y.isNotNull
    def m(c: Column, t: DecimalType) = sum(when(both, c).cast(t)).over(w).cast("double")
    val cnt = count(when(both, lit(1))).over(w).cast("double")
    val sx = m(x, graft.util.Num.Money)
    val sy = m(y, graft.util.Num.Money)
    val sxy = m(x * y, Sq)
    val sxx = m(x * x, Sq)
    val vx = greatest(cnt * sxx - sx * sx, lit(0.0))
    df.withColumn(as,
      when(cnt === n && vx > 0, round((cnt * sxy - sx * sy) / vx, 6)))
  }

  /** Time-weighted average price per (key, bucket) — the irregular-tick
    * companion to VWAP (q44): each observation is weighted by how long it
    * REMAINED the latest value, so a burst of ticks in one second can't
    * dominate a quiet hour. The last tick of a bucket carries to the
    * bucket's end (every bucket's weights tile its span exactly from the
    * first tick on).
    *
    * Weights are exact integer microseconds (a lead window + one interval
    * edge); the weighted sum runs over exact decimals and the single
    * division is engine-stable — hash-checkable like every money
    * aggregate here.
    *
    * Scale shape: one window shuffle by (key, bucket-day) + one hash
    * aggregate, map-side combinable.
    *
    * @param bucket Spark `date_trunc` unit ("day", "hour", …)
    * @return (key, bucket, twap, n_ticks)
    */
  def twap(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
           tiebreakCol: String, bucket: String = "day"): DataFrame = {
    val b = date_trunc(bucket, col(tsCol))
    val w = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col(tsCol), col(tiebreakCol))
    val bucketEnd = col("__b") + expr(s"INTERVAL 1 $bucket")
    df.withColumn("__b", b)
      .withColumn("__dt",
        unix_micros(coalesce(lead(col(tsCol), 1).over(w),
          bucketEnd.cast("timestamp")).cast("timestamp")) -
          unix_micros(col(tsCol).cast("timestamp")))
      .groupBy(col(keyCol), col("__b").as("bucket"))
      .agg(
        (sum((col(valueCol) * col("__dt")).cast(Sq)).cast("double") /
          sum(col("__dt").cast(graft.util.Num.Money)).cast("double")).as("__t"),
        count(lit(1)).as("n_ticks"))
      .select(col(keyCol), col("bucket"), round(col("__t"), 6).as("twap"),
        col("n_ticks"))
  }
}
