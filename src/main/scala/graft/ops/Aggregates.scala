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

  /** Pairwise Pearson correlation between every two keyed series, paired on
    * a shared time bucket — the cross-asset correlation matrix a financial
    * pipeline derives from per-ticker bars (and the redundancy signal a
    * data-mixing pipeline reads across corpus slices).
    *
    * NOT Spark's `corr` (a streaming double accumulator whose result depends
    * on partition order): moments are decimal-exact sums of per-row double
    * products, so the matrix is bit-stable across engines and parallelism —
    * the same [[Num]] discipline as `q51`'s variance. The upper triangle is
    * emitted once (`key_a < key_b`).
    *
    * Scale shape: one aggregate builds the (bucket, key) series; the pair
    * join is per-bucket — |keys|² rows per bucket, fine for asset universes
    * (thousands), and the moment aggregate keyed on (key_a, key_b) is
    * |keys|²-sized, not data-sized. A constant series (zero variance) yields
    * NULL, never a divide-by-zero (ANSI).
    */
  def pairwiseCorr(df: DataFrame, keyCol: String, bucket: Column,
                   value: String): DataFrame = {
    val series = df.groupBy(col(keyCol).as("k"), bucket.as("b"))
      .agg(Num.dsum(col(value)).as("v"))
    val pairs = series.as("x")
      .join(series.as("y"), col("x.b") === col("y.b") && col("x.k") < col("y.k"))
      .select(col("x.k").as("key_a"), col("y.k").as("key_b"),
        col("x.v").as("vx"), col("y.v").as("vy"))
    val m = pairs.groupBy("key_a", "key_b").agg(
      count(lit(1)).as("n"),
      Num.dsum(col("vx")).as("sx"), Num.dsum(col("vy")).as("sy"),
      Num.dsum(col("vx") * col("vx")).as("sxx"),
      Num.dsum(col("vy") * col("vy")).as("syy"),
      Num.dsum(col("vx") * col("vy")).as("sxy"))
    val den = sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
      sqrt(col("syy") - col("sy") * col("sy") / col("n"))
    m.select(col("key_a"), col("key_b"), col("n"),
      when(den === 0, lit(null))
        .otherwise((col("sxy") - col("sx") * col("sy") / col("n")) / den)
        .as("corr"))
  }
}
