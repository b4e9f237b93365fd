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
}
