package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Num

/** Time-series resampling — the OHLC downsample every bar store needs
  * (reference domain: daily bars keyed (Ticker, Date),
  * /root/reference/extraction.py:105; resampling is its natural companion
  * operator, absent from the reference).
  *
  * One hash aggregate: open/close come from lexicographic min/max over a
  * (time, tiebreak, price) struct — deterministic under ties and
  * partitioning, no window pass, map-side combinable. Sums use the exact
  * decimal accumulator. Scale shape: a single shuffle keyed by
  * (key, bucket); at 100 TB bucket-partitioned output aligns with a
  * partitioned lake layout.
  */
object Resample {

  /** @param bucket Spark date_trunc unit: "week", "month", "quarter", "year" */
  def ohlc(df: DataFrame, key: String, time: String, price: String,
           tiebreak: String, bucket: String): DataFrame = {
    val b = date_trunc(bucket, col(time))
    df.withColumn("__bucket", b)
      .groupBy(col(key), col("__bucket").as("bucket"))
      .agg(
        min(struct(col(time), col(tiebreak), col(price))).as("__o"),
        max(struct(col(time), col(tiebreak), col(price))).as("__c"),
        max(col(price)).as("high"),
        min(col(price)).as("low"),
        count(lit(1)).as("n_bars"),
        Num.dsum(col(price)).as("turnover"))
      .select(col(key), col("bucket"),
        col(s"__o.$price").as("open"), col("high"), col("low"),
        col(s"__c.$price").as("close"), col("n_bars"), col("turnover"))
  }

  /** Daily calendar gap-fill with forward fill (upsample): aggregate to one
    * value per (key, day), generate each key's full [min-day, max-day] spine
    * (`sequence` + explode — distributed, no driver calendar), left-join the
    * dailies onto the spine, and carry the last present value forward with
    * `last(_, ignoreNulls)` over an unbounded-preceding frame. The hole the
    * reference's daily-bar model always has (no bars on holidays) made
    * explicit and filled.
    *
    * Scale shape: one agg shuffle + one window shuffle, both keyed by `key`;
    * spine rows ≈ keys × span-days, generated where the key lives.
    * `is_gap` marks SPINE-ONLY days (no input rows that day) via an explicit
    * presence marker, so a present day whose aggregate is legitimately NULL
    * is not mislabeled; the forward fill carries the last NON-NULL value
    * past such days, and `v_filled` is null only until the key's first
    * non-null aggregate.
    *
    * @return (key, day: timestamp_ntz, v_filled, is_gap)
    */
  def fillDailyForward(df: DataFrame, key: String, time: String,
                       value: Column): DataFrame = {
    val daily = df
      .groupBy(col(key), to_date(col(time)).as("__d"))
      .agg(value.as("__v"))
      .withColumn("__present", lit(true))
    val spine = daily.groupBy(col(key))
      .agg(min(col("__d")).as("__d0"), max(col("__d")).as("__d1"))
      .select(col(key), explode(sequence(col("__d0"), col("__d1"))).as("__d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy("__d")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.join(daily, Seq(key, "__d"), "left")
      .select(col(key),
        col("__d").cast("timestamp_ntz").as("day"),
        last(col("__v"), ignoreNulls = true).over(w).as("v_filled"),
        col("__present").isNull.as("is_gap"))
  }
}
