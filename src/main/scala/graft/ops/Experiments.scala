package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Experiment (A/B) analysis: per-group two-sample comparison of a metric
  * between treatment and control — counts, means, and Welch's t statistic
  * (unequal variances, the safe default). The end of every product-analytics
  * pipeline: funnel (q105) finds the drop-off, the experiment moves it,
  * this measures it. (No reference analog — an [EXT] operator on the same
  * event model as the funnel family.)
  *
  * Determinism contract (same as [[Indicators]]): every sum is an exact
  * decimal (count, Σx, Σx² per arm — one conditional aggregate pass, no
  * self-join), and the t statistic is a FIXED sequence of double ops
  * mirrored verbatim in the oracle, rounded. Sample variance uses the
  * sum-of-squares identity, clamped at 0.
  *
  * Scale shape: ONE map-side-combinable hash aggregate over the metric
  * table — six conditional sums per group — then pure projection. Nothing
  * shuffles but the group keys.
  */
object Experiments {

  private val Sq: DecimalType = DecimalType(38, 6)

  /** @param arm boolean column: true = treatment (a), false = control (b)
    * @return per group: (n_a, n_b, mean_a, mean_b, t) — mean/t rounded to
    *         6; t null unless both arms have ≥ 2 rows and positive
    *         pooled standard error
    */
  def welchT(df: DataFrame, groupCols: Seq[String], arm: Column,
             valueCol: String): DataFrame = {
    val v = col(valueCol)
    def side(cond: Column, c: Column) = when(cond, c)
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(side(arm, v)).as("n_a"),
      count(side(!arm, v)).as("n_b"),
      sum(side(arm, v).cast(graft.util.Num.Money)).cast("double").as("__sa"),
      sum(side(!arm, v).cast(graft.util.Num.Money)).cast("double").as("__sb"),
      sum(side(arm, v * v).cast(Sq)).cast("double").as("__qa"),
      sum(side(!arm, v * v).cast(Sq)).cast("double").as("__qb"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val meanA = col("__sa") / na
    val meanB = col("__sb") / nb
    val varA = greatest((col("__qa") - col("__sa") * col("__sa") / na) / (na - 1.0), lit(0.0))
    val varB = greatest((col("__qb") - col("__sb") * col("__sb") / nb) / (nb - 1.0), lit(0.0))
    val se2 = varA / na + varB / nb
    agg
      .withColumn("mean_a", when(col("n_a") > 0, round(meanA, 6)))
      .withColumn("mean_b", when(col("n_b") > 0, round(meanB, 6)))
      .withColumn("t",
        when(col("n_a") >= 2 && col("n_b") >= 2 && se2 > 0,
          round((meanA - meanB) / sqrt(se2), 6)))
      .drop("__sa", "__sb", "__qa", "__qb")
  }

  /** CUPED variance reduction: adjust the experiment metric with a
    * PRE-EXPERIMENT covariate before testing —
    * y′ = y − θ·(x − x̄) with θ = cov(x, y)/var(x) fitted on the POOLED
    * units (assignment-independent, so the adjustment is unbiased under
    * randomization; the arm means of y′ shift together and the true
    * effect is preserved while covariate-explained variance drops by the
    * squared correlation). Returns the adjusted unit-level frame — feed
    * it straight to [[welchT]] for the tighter readout.
    *
    * Determinism: θ and x̄ come from exact decimal moments (one pooled
    * aggregate per group, broadcast back); each row's adjustment is three
    * double ops. Zero covariate variance → θ = 0 (adjustment is a no-op,
    * not a divide-by-zero).
    *
    * @return input + (`<yCol>_cuped`)
    */
  def cuped(df: DataFrame, groupCols: Seq[String], yCol: String,
            xCol: String): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    // θ is fitted on COMPLETE (x, y) pairs only: n and every moment count
    // the same rows, so a null covariate or metric can't bias θ or x̄ (it
    // would if n counted all rows while the sums skipped nulls). Rows with
    // a null x or y pass through with a null adjusted metric.
    val both = x.isNotNull && y.isNotNull
    val m = df.groupBy(groupCols.map(col): _*).agg(
      count(when(both, 1)).cast("double").as("__n"),
      sum(when(both, x).cast(graft.util.Num.Money)).cast("double").as("__sx"),
      sum(when(both, y).cast(graft.util.Num.Money)).cast("double").as("__sy"),
      sum(when(both, x * y).cast(Sq)).cast("double").as("__sxy"),
      sum(when(both, x * x).cast(Sq)).cast("double").as("__sxx"))
    val varX = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val theta = when(varX > 0,
      (col("__n") * col("__sxy") - col("__sx") * col("__sy")) / varX)
      .otherwise(lit(0.0))
    val joined = if (groupCols.isEmpty) df.crossJoin(broadcast(m))
      else df.join(broadcast(m), groupCols)
    joined
      .withColumn(s"${yCol}_cuped",
        y - theta * (x - col("__sx") / col("__n")))
      .drop("__n", "__sx", "__sy", "__sxy", "__sxx")
  }
}
