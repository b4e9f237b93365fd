package graft.ops

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.functions._
import graft.util.Num

/** Aggregation operators (SURVEY.md §2.4).
  *
  * The reference's only aggregates are emptiness counts
  * (/root/reference/transformation.py:52, loading.py:111); the full surface
  * here is the [EXT] set: hash aggregate, distinct counts (exact + HLL),
  * rollup/cube/grouping sets.
  *
  * Scale notes: groupBy().agg() gets map-side partial aggregation from
  * Catalyst automatically — the shuffle carries one row per (partition, key),
  * not per input row. Exact countDistinct on high-cardinality keys expands to
  * a two-phase aggregate; prefer [[approxDistinct]] (HLL++, constant memory)
  * when 2-3% error is acceptable at 100 TB.
  */
object Aggregates {

  /** Money-exact sum/avg plus count per group. */
  def summarize(df: DataFrame, keys: Seq[String], value: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      Num.dsum(col(value)).as(s"sum_$value"),
      Num.davg(col(value)).as(s"avg_$value"),
      min(col(value)).as(s"min_$value"),
      max(col(value)).as(s"max_$value"),
      count(lit(1)).as("n"))

  def exactDistinct(df: DataFrame, keys: Seq[String], of: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(countDistinct(of.head, of.tail: _*).as("n_distinct"))

  def approxDistinct(df: DataFrame, keys: Seq[String], of: String, rsd: Double = 0.02): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(approx_count_distinct(col(of), rsd).as("approx_distinct"))

  def rollupCount(df: DataFrame, keys: Seq[String], value: String): DataFrame =
    df.rollup(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), Num.dsum(col(value)).as(s"sum_$value"))

  def cubeCount(df: DataFrame, keys: Seq[String]): DataFrame =
    df.cube(keys.map(col): _*).agg(count(lit(1)).as("n"))

  /** Volume-weighted average price — composes from built-ins, no UDAF
    * (SURVEY.md §2.4 A7): sum(price*vol)/sum(vol), exact accumulator.
    */
  def vwap(df: DataFrame, keys: Seq[String], price: String, volume: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      (Num.dsum(col(price) * col(volume)) / Num.dsum(col(volume))).as("vwap"))
}
