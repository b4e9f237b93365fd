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

  /** One-way ANOVA F — [[welchT]]'s k-ARM generalization: does ANY arm's
    * mean differ, before k·(k−1)/2 pairwise t-tests eat the α budget.
    * `F = (SSB/(k−1)) / (SSW/(N−k))` from the between/within sum-of-
    * squares identity over per-arm exact moments: SSB = Σ nₐ(x̄ₐ − x̄)²
    * = Σ Sₐ²/nₐ − S²/N, SSW = ΣQ − Σ Sₐ²/nₐ — every Σ an exact DECIMAL,
    * the identity terms a fixed double tree, SSW clamped at 0 (the
    * [[welchT]] variance-clamp convention).
    *
    * Scale shape: ONE (group, arm) hash aggregate then bounded per-group
    * algebra — the metric table never shuffles beyond its keys.
    * Degenerate cases are NULL, never a crash: k < 2 (nothing to
    * compare), N ≤ k (no within-variance df), SSW = 0 with SSB > 0
    * (infinite separation — report NULL and let the caller read
    * ssb/ssw).
    *
    * @param armCol categorical arm label (any type)
    * @return per group: (groupCols…, k, n, ssb_micro, ssw_micro,
    *         f_micro)
    */
  def anovaF(df: DataFrame, groupCols: Seq[String], armCol: String,
             valueCol: String): DataFrame = {
    val v = col(valueCol)
    val g = groupCols.map(col)
    val perArm = df.filter(v.isNotNull && col(armCol).isNotNull)
      .groupBy((g :+ col(armCol)): _*)
      .agg(count(lit(1)).as("__na"),
        sum(v.cast(graft.util.Num.Money)).as("__sa"),
        sum((v * v).cast(Sq)).as("__qa"))
    val perGroup = perArm.groupBy(g: _*)
      .agg(count(lit(1)).as("k"), sum(col("__na")).as("n"),
        sum(col("__sa")).cast("double").as("__s"),
        sum(col("__qa")).cast("double").as("__q"),
        // Σ Sₐ²/nₐ: per-arm double terms summed — each a single division
        // of exact decimals; MICRO-floored (1e6, matching the q260
        // oracle's grain) before the sum (commuting) — ADVICE r16: the
        // old comment said nano
        sum(floor(col("__sa").cast("double") * col("__sa").cast("double") /
          col("__na").cast("double") * lit(1e6) + lit(0.5)).cast("long")
          .cast(DecimalType(38, 0))).as("__sbn"))
    val explained = col("__sbn").cast("double") / lit(1e6)
    val ssb = explained - col("__s") * col("__s") / col("n").cast("double")
    val ssw = greatest(col("__q") - explained, lit(0.0))
    val f = (ssb / (col("k").cast("double") - lit(1.0))) /
      (ssw / (col("n").cast("double") - col("k").cast("double")))
    def micro(c: Column, as: String) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("long").as(as)
    perGroup.select((g ++ Seq(col("k"), col("n"),
      micro(ssb, "ssb_micro"), micro(ssw, "ssw_micro"),
      micro(when(col("k") < 2 || col("n") <= col("k") || ssw === 0.0,
        lit(null)).otherwise(f), "f_micro"))): _*)
  }

  /** Kruskal–Wallis H — [[anovaF]]'s RANK-based sibling (and
    * [[graft.ops.Drift.uTest]]'s k-group generalization): compares arm
    * rank means instead of value means, so heavy tails and outliers
    * cannot fake or mask a shift. Tie-mid-ranks in DOUBLED integer
    * units (`2·midrank(v) = 2·below(v) + t(v) + 1` — exact longs, no
    * half floats), `H = 12/(N(N+1))·Σ nₐ(r̄ₐ − r̄)²` via the rank-sum
    * identity `Σ Rₐ²/nₐ` over exact decimal rank sums, divided by the
    * tie correction `1 − Σ(t³−t)/(N³−N)`. All-tied pools (correction 0)
    * report NULL, never a division crash.
    *
    * Scale shape: one (group, value) count aggregate, one per-group
    * window over DISTINCT values (the bounded-codomain contract), one
    * per-group reduce.
    *
    * @return per group: (groupCols…, k, n, h_micro)
    */
  def kruskalWallis(df: DataFrame, groupCols: Seq[String], armCol: String,
                    valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val Dec = DecimalType(38, 0)
    val g = groupCols.map(col)
    val v = col(valueCol).cast("long")
    val cells = df.filter(v.isNotNull && col(armCol).isNotNull)
      .groupBy((g :+ col(armCol).as("__arm") :+ v.as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    // per distinct value: total tie size and the doubled mid-rank
    val w = Window.partitionBy(g: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val vals = cells.groupBy((g :+ col("__v")): _*)
      .agg(sum(col("__c")).as("__t"))
      .withColumn("__below", coalesce(sum(col("__t")).over(w), lit(0L)))
      .select((g ++ Seq(col("__v"), col("__t"),
        (col("__below") * 2 + col("__t") + 1).as("__r2"))): _*)
    val perArm = cells.join(vals, groupCols :+ "__v")
      .groupBy((g :+ col("__arm")): _*)
      .agg(sum(col("__c")).as("__na"),
        sum(col("__c").cast(Dec) * col("__r2").cast(Dec)).as("__R2a"))
    val perGroup = perArm.groupBy(g: _*)
      .agg(count(lit(1)).as("k"), sum(col("__na")).as("n"),
        // Σ (2Rₐ)²/nₐ in MICRO-floored (1e6 — the oracle's grain, not
        // nano; ADVICE r16) doubles of exact decimals
        sum(floor(col("__R2a").cast("double") * col("__R2a").cast("double") /
          col("__na").cast("double") * lit(1e6) + lit(0.5)).cast("long")
          .cast(Dec)).as("__rr"))
    val ties = vals.groupBy(g: _*)
      .agg(sum(col("__t").cast(Dec) * col("__t").cast(Dec) *
        col("__t").cast(Dec) - col("__t").cast(Dec)).as("__ties"))
    val n = col("n").cast("double")
    // H with doubled ranks: Σ(2Rₐ)²/nₐ = 4·ΣRₐ²/nₐ, so the 12 becomes 3
    val hRaw = lit(3.0) / (n * (n + lit(1.0))) *
      (col("__rr").cast("double") / lit(1e6)) - lit(3.0) * (n + lit(1.0))
    val corr = lit(1.0) - col("__ties").cast("double") / (n * n * n - n)
    def micro(c: Column, as: String) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("long").as(as)
    val withTies = if (groupCols.isEmpty) perGroup.crossJoin(broadcast(ties))
      else perGroup.join(ties, groupCols)
    withTies
      .select((g ++ Seq(col("k"), col("n"),
        micro(when(col("k") < 2 || col("n") < 2 || corr <= 0.0, lit(null))
          .otherwise(hRaw / corr), "h_micro"))): _*)
  }
}
