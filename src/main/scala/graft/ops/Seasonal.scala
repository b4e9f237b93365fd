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

  /** Theil–Sen robust trend per key over a daily long-valued series: the
    * MEDIAN of all pairwise slopes `(x_j − x_i)/(d_j − d_i)`, i < j. The
    * outlier-proof answer to "is this series drifting?" — a single
    * corrupted ingest day drags an OLS slope arbitrarily far but moves
    * the slope median by at most one rank (breakdown point ~29%), which
    * is exactly the robustness an ingest-volume monitor needs.
    *
    * Deterministic: each slope is ONE double division of exact integer
    * operands; the median is an order statistic over that value multiset
    * (engine-independent, the q43 percentile parity), micro-quantized.
    *
    * Scale shape: the pair join is per-key and the series is DATE-grain —
    * n_days² pairs per key (a year = ~66k pairs), bounded by the calendar
    * however large the data underneath; the upstream daily aggregation is
    * where the volume dies. Keys partition the join, so the work spreads.
    *
    * @param df one row per (keys…, day) — pre-aggregated
    * @return keys… , n_pairs, slope_micro (keys with < 2 days drop out)
    */
  def theilSen(df: DataFrame, keys: Seq[String], dateCol: String,
               valueCol: String): DataFrame = {
    val base = df.select((keys.map(col) :+
      unix_date(col(dateCol)).cast("long").as("__dn") :+
      col(valueCol).cast("long").as("__v")): _*)
    val joinCond = (keys.map(k => col(s"a.$k") === col(s"b.$k")) :+
      (col("a.__dn") < col("b.__dn"))).reduce(_ && _)
    base.as("a").join(base.as("b"), joinCond)
      .select((keys.map(k => col(s"a.$k").as(k)) :+
        ((col("b.__v") - col("a.__v")).cast("double") /
          (col("b.__dn") - col("a.__dn")).cast("double")).as("__s")): _*)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_pairs"),
        floor(expr("percentile(__s, 0.5)") * lit(1000000.0) + lit(0.5))
          .cast("long").as("slope_micro"))
  }

  /** Classical OLS trend per key over a daily long-valued series — the
    * least-squares counterpart of [[theilSen]] (efficient on clean data
    * where Theil–Sen is robust to corrupt days; a monitor typically
    * alarms when the two DISAGREE, because that is what an outlier looks
    * like). Reports slope, intercept, and R² — how much of the variance
    * the trend explains.
    *
    * Deterministic: the five moment sums accumulate as DECIMAL(38,0)
    * (exact integer addition — partitioning cannot reorder a float sum),
    * and the closed-form estimates are a fixed tree of IEEE double
    * operations over those exact sums — same sums, same doubles, any
    * engine. Degenerate keys (one day, or zero x/y variance) yield NULL
    * estimates rather than a division error (ANSI-safe).
    *
    * Scale shape: ONE aggregate over the date-grain input — no pair
    * join at all (the n_days² cost is [[theilSen]]'s price for
    * robustness, not trend-fitting's).
    *
    * @param df one row per (keys… , day) — pre-aggregated
    * @return keys… , n_days, slope_micro, intercept_micro, r2_micro
    */
  def olsTrend(df: DataFrame, keys: Seq[String], dateCol: String,
               valueCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val x = unix_date(col(dateCol)).cast("long")
    val y = col(valueCol).cast("long")
    // products form in DECIMAL, never Long: a daily value near 3.04e9
    // squares past Long.MaxValue, and a Long product would wrap (or
    // throw under ANSI) BEFORE the exact-decimal cast could save it —
    // the documented exactness must hold at the 100 TB grain, where
    // per-key daily sums reach 1e10+ (review fix)
    val agg = df
      .select((keys.map(col) :+ x.cast(dec).as("__x") :+
        y.cast(dec).as("__y")): _*)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_days"),
        sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val n = col("n_days").cast("double")
    def d(c: Column) = c.cast("double")
    // the DISCRIMINANTS form in exact DECIMAL too: n·Σy² and (Σy)² agree
    // to ~15 digits at a 4e9 value scale, so a double subtraction
    // catastrophically cancels (measured: R² = 0.037 on a perfect line)
    // — subtract exactly, divide once in double (review-fix follow-on)
    val nD = col("n_days").cast(dec)
    val dxx = nD * col("__sxx") - col("__sx") * col("__sx")
    val dyy = nD * col("__syy") - col("__sy") * col("__sy")
    val num = nD * col("__sxy") - col("__sx") * col("__sy")
    val slope = when(dxx === 0, lit(null)).otherwise(d(num) / d(dxx))
    val intercept = (d(col("__sy")) - slope * d(col("__sx"))) / n
    val r2 = when(dxx === 0 || dyy === 0, lit(null))
      .otherwise(d(num) * d(num) / (d(dxx) * d(dyy)))
    def micro(c: Column, as: String) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("long").as(as)
    agg.select((keys.map(col) :+ col("n_days") :+
      micro(slope, "slope_micro") :+ micro(intercept, "intercept_micro") :+
      micro(r2, "r2_micro")): _*)
  }

  /** Pearson correlation over an exact-integer pair table at (group,
    * lag) grain — the shared moment core of [[autoCorrelation]] and
    * [[crossCorrelation]]. All five moments and BOTH discriminants form
    * in exact DECIMAL (the [[olsTrend]] cancellation lesson), sqrt and
    * one division in double, micro-quantized; pairs-too-few or
    * zero-variance groups report NULL, never 0.
    */
  private def corrByLag(pairs: DataFrame, groupCols: Seq[Column]): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val agg = pairs
      .select((groupCols :+ col("__a").cast(dec).as("__a") :+
        col("__b").cast(dec).as("__b")): _*)
      .groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__a")).as("__sa"), sum(col("__b")).as("__sb"),
        sum(col("__a") * col("__b")).as("__sab"),
        sum(col("__a") * col("__a")).as("__saa"),
        sum(col("__b") * col("__b")).as("__sbb"))
    val nD = col("n_pairs").cast(dec)
    def d(c: Column) = c.cast("double")
    val daa = nD * col("__saa") - col("__sa") * col("__sa")
    val dbb = nD * col("__sbb") - col("__sb") * col("__sb")
    val num = nD * col("__sab") - col("__sa") * col("__sb")
    val corr = when(col("n_pairs") < 2 || daa === 0 || dbb === 0, lit(null))
      .otherwise(d(num) / (sqrt(d(daa)) * sqrt(d(dbb))))
    agg.select((groupCols :+ col("n_pairs") :+
      floor(corr * lit(1000000.0) + lit(0.5)).cast("long").as("corr_micro")): _*)
  }

  /** Autocorrelation function per key: `corr(x_t, x_{t+lag})` for lags
    * 1..`maxLag` over the key's DAY-grain series — the seasonality
    * detector (a weekly cycle spikes lag 7; white noise sits near 0 at
    * every lag). Callers pass integer-grained values (cents, counts).
    *
    * Scale shape: the series is already at (key, day) grain (callers
    * aggregate first — the q201 discipline); each lag is one equi-join
    * of the series against itself on (key, day + lag) — |lags| keyed
    * joins at series grain, never the event log. Overlap windows shrink
    * with lag; lags with under 2 overlapping days report NULL.
    *
    * @return (keys…, lag, n_pairs, corr_micro)
    */
  def autoCorrelation(df: DataFrame, keys: Seq[String], dateCol: String,
                      valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"autoCorrelation: maxLag must be >= 1, got $maxLag")
    val k = keys.map(col)
    val base = df.select((k :+ col(dateCol).cast("date").as("__d") :+
      col(valueCol).cast("long").as("__v")): _*)
      .filter(col("__d").isNotNull && col("__v").isNotNull)
    val lagged = base.select((k :+ col("__d") :+ col("__v").as("__b")): _*)
    val pairs = base
      .crossJoin(broadcast(
        df.sparkSession.range(1, maxLag + 1).select(col("id").as("lag"))))
      .select((k :+ col("lag") :+ col("__v").as("__a") :+
        date_add(col("__d"), col("lag").cast("int")).as("__d")): _*)
      .join(lagged, keys :+ "__d")
    corrByLag(pairs, k :+ col("lag"))
  }

  /** Lead–lag cross-correlation between TWO day-grain series:
    * `corr(a_t, b_{t+lag})` for lags −`maxLag`..+`maxLag` — positive-lag
    * peaks mean A LEADS B (today's A co-moves with B `lag` days later),
    * the classic "does X anticipate Y" diagnostic; lag 0 is plain
    * contemporaneous correlation ([[graft.ops/Indicators]]' pairwise
    * grain, kept here for the sweep's completeness).
    *
    * Scale shape: 2·maxLag+1 keyed equi-joins of two series tables on the
    * shifted day — series grain, never the event log.
    *
    * @param a,b (dateCol, valueCol) day-grain integer series
    * @return (lag, n_pairs, corr_micro)
    */
  def crossCorrelation(a: DataFrame, b: DataFrame, dateCol: String,
                       valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"crossCorrelation: maxLag must be >= 0, got $maxLag")
    def side(df: DataFrame, as: String) =
      df.select(col(dateCol).cast("date").as("__d"),
        col(valueCol).cast("long").as(as))
        .filter(col("__d").isNotNull && col(as).isNotNull)
    val pairs = side(a, "__a")
      .crossJoin(broadcast(a.sparkSession
        .range(-maxLag.toLong, maxLag + 1L).select(col("id").as("lag"))))
      .select(col("lag"), col("__a"),
        date_add(col("__d"), col("lag").cast("int")).as("__d"))
      .join(side(b, "__b"), Seq("__d"))
    corrByLag(pairs, Seq(col("lag")))
  }
}
