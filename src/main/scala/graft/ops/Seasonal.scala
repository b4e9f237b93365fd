package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical seasonal decomposition of a daily series — the
  * trend / day-of-week / residual split (the additive moving-average
  * method behind STL's baseline, Cleveland 1990 §2) a pipeline uses to
  * spot ingest anomalies: "is today's volume low, or is it just Sunday?"
  */
object Seasonal {

  /** Additive decomposition per key over a DAILY long-valued series:
    *
    *   trend_t    = centered 7-day mean (full windows only, else null)
    *   seasonal_d = mean over the key's days with day-of-week d of
    *                (x_t − trend_t)
    *   residual_t = x_t − trend_t − seasonal_d
    *
    * Determinism (the oracle contract): the window sum `sum7` and the
    * per-dow deviation sums are EXACT longs — `dev7 = 7·x − sum7` stays
    * in integer space, so no float accumulates across rows in ANY
    * engine. The only doubles are the final three fixed-sequence
    * divisions (`sum7/7.0`, `sdev/(7.0·n)`, the subtraction chain),
    * identical operands in identical order everywhere, emitted as
    * `floor(x·1e6 + 0.5)` micro-units (the q190/q192 convention).
    * Day-of-week is `epoch_days mod 7` — engine-agnostic, unlike the
    * 0-vs-1-based `dayofweek` builtins.
    *
    * Scale shape: the series is DATE-grain per key — bounded by the
    * calendar (tens of thousands of rows per key at any corpus size),
    * so the per-key window is cheap by construction; the upstream daily
    * aggregation is where the data volume dies, and that is one
    * map-side-combined groupBy the caller owns. One window pass, one
    * small self-join on (key, dow).
    *
    * @param df       one row per (keys…, day) — pre-aggregated
    * @param dateCol  DATE column
    * @param valueCol exact LONG column (cents, counts…)
    * @return keys… , day, value, trend_micro, seasonal_micro,
    *         resid_micro (micro columns null where the window is
    *         partial)
    */
  def decomposeDaily(df: DataFrame, keys: Seq[String], dateCol: String,
                     valueCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(dateCol)).rowsBetween(-3, 3)
    val day = col(dateCol)
    val withTrend = df
      .withColumn("__dow",
        pmod(datediff(day, to_date(lit("1970-01-01"))), lit(7)))
      .withColumn("__sum7",
        when(count(col(valueCol)).over(w) === 7,
          sum(col(valueCol)).over(w)))
    // per-(key, dow) deviation: exact integer 7·x − sum7 over full rows
    val dev = withTrend.filter(col("__sum7").isNotNull)
      .groupBy((keys.map(col) :+ col("__dow")): _*)
      .agg(sum(lit(7L) * col(valueCol) - col("__sum7")).as("__sdev"),
        count(lit(1)).as("__n"))
    def micro(c: Column, as: String) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("long").as(as)
    withTrend.join(dev, keys :+ "__dow", "left")
      .select((keys.map(col) ++ Seq(
        day.as("day"), col(valueCol),
        micro(col("__sum7") / lit(7.0), "trend_micro"),
        micro(col("__sdev") / (lit(7.0) * col("__n")), "seasonal_micro"),
        micro(col(valueCol) - col("__sum7") / lit(7.0) -
          col("__sdev") / (lit(7.0) * col("__n")), "resid_micro"))): _*)
  }
}
