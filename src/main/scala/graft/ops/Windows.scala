package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import graft.util.Num

/** Window operators (SURVEY.md §2.8 — none exist in the reference; these are
  * the standard analytics set for keyed time-series like the reference's
  * (Ticker, Date) bars, /root/reference/extraction.py:105,112).
  *
  * All are single-shuffle: hash-partition by key, sort within partition.
  * Moving sums/averages use the exact-decimal accumulator ([[Num]]) so
  * results are engine- and partitioning-independent.
  */
object Windows {

  private def ordered(partitionBy: Seq[String], orderBy: Seq[Column]): WindowSpec =
    Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy: _*)

  /** Trailing n-row simple moving average (inclusive of current row). */
  def sma(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[Column],
          value: String, n: Int, as: String): DataFrame = {
    val w = ordered(partitionBy, orderBy).rowsBetween(-(n - 1), Window.currentRow)
    df.withColumn(as,
      sum(col(value).cast(Num.Money)).over(w).cast("double") /
        count(lit(1)).over(w))
  }

  /** Difference vs previous row (lag-1 delta), null for the first row. */
  def lagDelta(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[Column],
               value: String, as: String): DataFrame = {
    val w = ordered(partitionBy, orderBy)
    df.withColumn(as, col(value) - lag(col(value), 1).over(w))
  }

  /** Running (cumulative) exact sum. */
  def runningSum(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[Column],
                 value: String, as: String): DataFrame = {
    val w = ordered(partitionBy, orderBy)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, sum(col(value).cast(Num.Money)).over(w).cast("double"))
  }

  /** Top-n rows per key under `orderBy` (deterministic iff orderBy is total). */
  def topNPerKey(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[Column],
                 n: Int): DataFrame =
    df.withColumn("__rn", row_number().over(ordered(partitionBy, orderBy)))
      .filter(col("__rn") <= n)
      .withColumnRenamed("__rn", "rn")

  /** Maximum drawdown per key: the deepest peak-to-trough fall of `value`
    * over the ordered series, as a fraction of the running peak (≤ 0; 0 =
    * never below a prior peak). The running peak is a cumulative `max`
    * window (selection only — no arithmetic, so it is exact), and the
    * per-row drawdown divides two untouched doubles — bit-identical across
    * engines. A non-positive peak makes the ratio meaningless → NULL row,
    * ignored by the `min`. Single shuffle + per-key sort, then a hash
    * aggregate.
    */
  def maxDrawdown(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[Column],
                  value: String): DataFrame = {
    val w = ordered(partitionBy, orderBy)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peak = max(col(value)).over(w)
    df.withColumn("__dd",
        when(peak <= 0, lit(null)).otherwise((col(value) - peak) / peak))
      .groupBy(partitionBy.map(col): _*)
      .agg(min(col("__dd")).as("max_drawdown"), max(col(value)).as("peak"))
  }

  /** Exact exponential moving average per key: e₀ = x₀,
    * eₜ = α·xₜ + (1−α)·eₜ₋₁ — the recursive indicator SQL windows cannot
    * express directly (each row depends on the previous RESULT, not the
    * previous input). Implemented as one ordered collect per key and a
    * native linear scan ([[graft.functions.expressions.EmaScan]]) emitting
    * the whole running series, then re-exploded. The scan performs the same
    * left-to-right double ops as DuckDB's `list_reduce`, so the series is
    * oracle-checkable (rounded to 6). (The previous `aggregate` +
    * `concat(acc, …)` fold was O(series²) — every append copied the
    * accumulator array; the native scan is O(series).)
    *
    * Scale shape: one shuffle by key; each key's series materializes as an
    * array on one task (the same bounded-series contract as sessionization
    * or any per-entity indicator — fine for bars-per-ticker or
    * events-per-user, not for a single global series; there is no
    * partition-parallel exact EMA because every element depends on all
    * predecessors).
    *
    * @param orderCols total order within key (include a unique tiebreaker)
    */
  def ema(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
          valueCol: String, alpha: Double, as: String = "ema"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val grouped = df.groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(
        struct(orderCols.map(col): _*).as("__o"),
        col(valueCol).as("__v")))).as("__s"))
    val emaSeries = graft.functions.expressions.EmaScan(
      transform(col("__s"), _.getField("__v").cast("double")), alpha)
    grouped.withColumn("__e", emaSeries)
      .select((keys.map(col) :+
        posexplode(arrays_zip(col("__s"), col("__e"))).as(Seq("__i", "__z"))): _*)
      .select((keys.map(col) ++
        orderCols.map(o => col(s"__z.__s.__o.$o").as(o)) ++
        Seq(col("__z.__s.__v").as(valueCol), round(col("__z.__e"), 6).as(as))): _*)
  }

  /** Holt linear-trend smoothing (double exponential) per key: level,
    * trend, and the one-step-ahead forecast `level + trend` at every
    * position of the ordered series — the trend-aware sibling of [[ema]]
    * for drifting series (spend per account, tokens per day) where a
    * flat EMA lags the slope.
    *
    * Same plan shape as [[ema]]: one groupBy collects the ordered
    * series (per-key series bounded by the same contract), one
    * O(series) native scan ([[graft.functions.expressions.HoltScan]] —
    * the coupled recurrences admit no HOF fold), one posexplode back to
    * rows. Outputs are RAW doubles — cross-engine hashing must quantize
    * explicitly (`floor(x·1e6 + 0.5)`, the q190 convention) because
    * `round(x, 6)` itself diverges between engines at half boundaries
    * (Spark rounds the shortest decimal repr HALF_UP, DuckDB rounds the
    * scaled binary double — the q192 lesson: same double, different
    * 6th digit).
    *
    * @return df columns keys ++ orderCols ++ (valueCol, level, trend,
    *         forecast)
    */
  def holt(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
           valueCol: String, alpha: Double, beta: Double): DataFrame = {
    val grouped = df.groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(
        struct(orderCols.map(col): _*).as("__o"),
        col(valueCol).as("__v")))).as("__s"))
    val holtSeries = graft.functions.expressions.HoltScan(
      transform(col("__s"), _.getField("__v").cast("double")), alpha, beta)
    grouped.withColumn("__h", holtSeries)
      .select((keys.map(col) :+
        posexplode(arrays_zip(col("__s"), col("__h"))).as(Seq("__i", "__z"))): _*)
      .select((keys.map(col) ++
        orderCols.map(o => col(s"__z.__s.__o.$o").as(o)) ++
        Seq(col("__z.__s.__v").as(valueCol),
          col("__z.__h.level").as("level"),
          col("__z.__h.trend").as("trend"),
          (col("__z.__h.level") + col("__z.__h.trend")).as("forecast"))): _*)
  }

  /** One-sided CUSUM drift statistic per key (Page 1954): the running
    * `max(0, s + (x − μ_key − slack))` over the ordered series, where
    * μ_key is the key's own mean — the change-point detector that pairs
    * with [[graft.ops.Seasonal.decomposeDaily]]: seasonality explains
    * the rhythm, CUSUM flags the level shift. `s > h` downstream is the
    * alarm; the negative-side detector is this op over the negated
    * series.
    *
    * Determinism: μ comes from an exact DECIMAL sum (order-independent)
    * divided once in double; deviations and the scan are a fixed
    * left-to-right IEEE sequence ([[graft.functions.expressions.CusumScan]]
    * — the coupled max/add recurrence has no linear-time SQL fold).
    * Callers quantize outputs (micro-units) for cross-engine hashing.
    *
    * @return keys ++ orderCols ++ (valueCol, cusum) — cusum RAW doubles
    */
  def cusum(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
            valueCol: String, slack: Double): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val grouped = df.groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(
        struct(orderCols.map(col): _*).as("__o"),
        col(valueCol).as("__v")))).as("__s"),
        sum(col(valueCol).cast(dec)).as("__sum"),
        count(col(valueCol)).as("__n"))
    val mu = col("__sum").cast("double") / col("__n").cast("double")
    val scanned = grouped.withColumn("__c",
      graft.functions.expressions.CusumScan(
        transform(col("__s"),
          x => x.getField("__v").cast("double") - mu - lit(slack))))
    scanned
      .select((keys.map(col) :+
        posexplode(arrays_zip(col("__s"), col("__c"))).as(Seq("__i", "__z"))): _*)
      .select((keys.map(col) ++
        orderCols.map(o => col(s"__z.__s.__o.$o").as(o)) ++
        Seq(col("__z.__s.__v").as(valueCol),
          col("__z.__c").as("cusum"))): _*)
  }

  /** rank / dense_rank / row_number in one projection. */
  def ranked(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = ordered(partitionBy, orderBy)
    df.withColumns(Map(
      "rnk"  -> rank().over(w),
      "drnk" -> dense_rank().over(w),
      "rn"   -> row_number().over(w)))
  }

  /** Longest underwater stretch per key — the TIME axis of drawdown where
    * [[maxDrawdown]] is the depth: the maximum number of consecutive
    * observations spent strictly below the prior running peak, plus that
    * stretch's wall-clock span. Runs are delimited with the classic
    * gaps-and-islands trick: a running count of at-peak rows is constant
    * exactly while underwater, so it is the island id — two window passes
    * over ONE (key) partitioning, then a two-level aggregate. All counts
    * and timestamps exact.
    *
    * A key that never dips emits 0 / null span (`coalesce` over the empty
    * max), not a missing row.
    *
    * @param tsCol ordering timestamp (also used for the span)
    * @return (keys…, max_underwater_n, max_underwater_us)
    */
  def maxUnderwater(df: DataFrame, keys: Seq[String], tsCol: String,
                    tiebreakCol: String, valueCol: String): DataFrame = {
    val ord = ordered(keys, Seq(col(tsCol), col(tiebreakCol)))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peak = max(col(valueCol)).over(cum)
    val under = col(valueCol) < peak
    // materialize the underwater flag first — summing over the raw window
    // expression would be a (disallowed) nested window function
    val marked = df
      .withColumn("__under", under)
      .withColumn("__grp",
        sum(when(col("__under"), 0L).otherwise(1L)).over(cum))
    val runs = marked.filter(col("__under"))
      .groupBy((keys.map(col) :+ col("__grp")): _*)
      .agg(count(lit(1)).as("__n"),
        (unix_micros(max(col(tsCol)).cast("timestamp")) -
          unix_micros(min(col(tsCol)).cast("timestamp"))).as("__us"))
      .groupBy(keys.map(col): _*)
      .agg(max(col("__n")).as("max_underwater_n"),
        max(col("__us")).as("max_underwater_us"))
    df.select(keys.map(col): _*).distinct()
      .join(runs, keys, "left")
      .withColumn("max_underwater_n",
        coalesce(col("max_underwater_n"), lit(0L)))
  }
}
