package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equal-frequency (quantile) binning — the feature-discretization step ML
  * pipelines run before building histograms, decision-tree splits, or
  * monotonic-feature buckets: each value is replaced by which of `nBins`
  * equally-populated bins it falls in WITHIN its group. (Reference
  * domain: the price distributions of /root/reference/extraction.py:105's
  * bars are exactly what a downstream model would discretize; the
  * reference itself ships values raw.)
  *
  * The n−1 interior fences come from one `percentile` aggregate per group
  * (an ARRAY of cut points in a single pass — not n separate aggregates),
  * broadcast back and folded into a bin index with a Catalyst `aggregate`
  * HOF: bin = #fences ≤ value, giving bins 0..n−1 with ties going UP (a
  * value exactly on a fence starts the next bin — deterministic in both
  * engines). Same exact-vs-approx contract as [[Outliers]]: exact
  * `percentile` matches DuckDB `quantile_cont` bit-for-bit (q43), and
  * `approx = true` swaps in the mergeable `approx_percentile` sketch for
  * the 100 TB path (fence placement jitters within rank error; bin
  * SEMANTICS relative to the fences are unchanged).
  *
  * Scale shape: one group-cardinality aggregate + a broadcast join back —
  * the big table is scanned twice (fences, tag), shuffled never.
  */
object Binning {

  /** @param groupCols empty = one global fence set (whole-table deciles
    *                   etc. — still no global sort, just one aggregate)
    * @return input rows + (bin: int in [0, nBins-1]) */
  def equalFrequency(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     nBins: Int, approx: Boolean = false,
                     accuracy: Int = 10000): DataFrame = {
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val fences =
      if (approx)
        df.groupBy(groupCols.map(col): _*)
          .agg(percentile_approx(col(valueCol),
            array(ps.map(lit): _*), lit(accuracy)).as("__fences"))
      else
        df.groupBy(groupCols.map(col): _*)
          .agg(percentile(col(valueCol), array(ps.map(lit): _*)).as("__fences"))
    val joined = if (groupCols.isEmpty) df.crossJoin(broadcast(fences))
      else df.join(broadcast(fences), groupCols)
    // a NULL value belongs to no bin (the fold's null-comparison would
    // otherwise quietly land it in bin 0)
    joined
      .withColumn("bin", when(col(valueCol).isNotNull,
        aggregate(col("__fences"), lit(0),
          (acc, f) => acc + when(col(valueCol) >= f, 1).otherwise(0))))
      .drop("__fences")
  }

  /** Concentration (Pareto) report: units quantile-binned by `valueCol`,
    * with each bin's share and cumulative share of the total — "the top
    * decile of customers carries X% of revenue", the whale-analysis /
    * 80-20 readout. Built on [[equalFrequency]]'s broadcast fences, NOT a
    * global rank window — so no single-task global sort ever happens; the
    * only tiny window is the nBins-row cumulative sum.
    *
    * Exact decimal value sums; shares are single engine-stable divisions,
    * rounded. Bin nBins−1 is the top of the distribution.
    *
    * @return one row per bin: (bin, n_units, value_sum, share, cum_share)
    */
  def concentration(units: DataFrame, valueCol: String, nBins: Int = 10,
                    approx: Boolean = false, accuracy: Int = 10000): DataFrame = {
    import graft.util.Num
    // null-valued units carry no bin (see equalFrequency) — drop them here
    // rather than emit a bin=null report row, whose position under the
    // cum_share window would also differ between engines (Spark sorts nulls
    // first, DuckDB last)
    val per = equalFrequency(units, Nil, valueCol, nBins, approx, accuracy)
      .filter(col("bin").isNotNull)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_units"), Num.dsum(col(valueCol)).as("value_sum"))
    val tot = per.agg(Num.dsum(col("value_sum")).as("__tot"))
    val cum = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    per.crossJoin(broadcast(tot))
      .withColumn("share", when(col("__tot") =!= 0,
        round(col("value_sum") / col("__tot"), 6)))
      .withColumn("cum_share", when(col("__tot") =!= 0,
        round(sum(col("value_sum").cast(Num.Money)).over(cum).cast("double") /
          col("__tot"), 6)))
      .drop("__tot")
  }
}
