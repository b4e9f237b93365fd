package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis: the Kaplan–Meier product-limit estimator (Kaplan &
  * Meier 1958) — the retention/churn curve done right, i.e. WITH
  * censoring: a user still active when the observation window closes is
  * not a churn at their last-seen duration, and dropping or
  * mis-labelling those rows biases naive retention curves downward. The
  * estimator handles them as censored at-risk mass.
  *
  * `S(t) = Π_{u ≤ t, d_u > 0} (1 − d_u / n_u)` over distinct event times
  * u, with `n_u` = subjects still at risk at u (duration ≥ u) and `d_u` =
  * observed events at u. Computed in log space as a cumulative sum of
  * `ln(1 − d/n)` terms — each term is one division and one ln,
  * NANO-floored before the (windowed) sum so partitioning cannot reorder
  * a double accumulation; `exp` of the cumulative sum is taken once per
  * output row, micro-quantized. A time where everyone remaining dies
  * (d = n) sends the curve exactly to 0 from that point on (the ln is
  * −∞; handled as a flag, not a float).
  *
  * Scale shape: subjects reduce to (duration, event-flag) rows upstream;
  * ONE aggregate to distinct-duration grain, then two windows over the
  * distinct durations (bounded-distinct contract — durations are
  * day/bucket-grained) — the subject table is touched once.
  *
  * @param durCol   non-negative integer duration (days, buckets)
  * @param eventCol boolean/0-1: true = event observed, false = censored
  * @return one row per distinct duration with at least one OBSERVED
  *         event: (t, n_risk, n_events, surv_micro) — S(t) AFTER the
  *         events at t
  */
object Survival {

  def kaplanMeier(df: DataFrame, durCol: String, eventCol: String): DataFrame = {
    val slim = df
      .filter(col(durCol).isNotNull && col(eventCol).isNotNull &&
        col(durCol) >= 0)
      .select(col(durCol).cast("long").as("t"),
        col(eventCol).cast("boolean").cast("int").cast("long").as("__e"))
    val byT = slim.groupBy("t")
      .agg(count(lit(1)).as("__all"), sum(col("__e")).as("n_events"))
    // at-risk at t = subjects with duration ≥ t: reverse cumulative count
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risky = byT.withColumn("n_risk", sum(col("__all")).over(wDesc))
    // ln(1 − d/n) nano-floored per time; d = n flags absorption to 0
    val term = floor(log(lit(1.0) -
      col("n_events").cast("double") / col("n_risk").cast("double")) *
      lit(1e9) + lit(0.5)).cast("long")
    val curve = risky
      .withColumn("__dead", col("n_events") === col("n_risk"))
      .withColumn("__term", when(col("__dead") || col("n_events") === 0,
        lit(0L)).otherwise(term))
      .withColumn("__cum", sum(col("__term")).over(wAsc))
      .withColumn("__anyDead",
        max(col("__dead").cast("int")).over(wAsc) === 1)
    curve.filter(col("n_events") > 0)
      .select(col("t"), col("n_risk"), col("n_events"),
        when(col("__anyDead"), lit(0L))
          .otherwise(floor(exp(col("__cum").cast("double") / lit(1e9)) *
            lit(1000000.0) + lit(0.5)).cast("long")).as("surv_micro"))
  }
}
