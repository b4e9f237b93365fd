package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import graft.ops.Seasonal

/** Seasonal decomposition: analytic truths (constant and linear series
  * decompose to zero seasonality/residual), partial-window nulls, and a
  * planted weekly pattern recovered exactly.
  */
class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  private def days(k: String, vals: Seq[Long]) =
    vals.zipWithIndex.map { case (v, i) =>
      (k, Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), v)
    }

  test("constant series: trend = value, seasonal = residual = 0") {
    val df = days("a", Seq.fill(14)(700L)).toDF("k", "d", "v")
    val out = Seasonal.decomposeDaily(df, Seq("k"), "d", "v")
      .filter($"trend_micro".isNotNull)
      .select("trend_micro", "seasonal_micro", "resid_micro")
      .as[(Long, Long, Long)].collect()
    assert(out.length == 8) // 14 days, 3 trimmed each side
    assert(out.forall(_ == ((700000000L, 0L, 0L))))
  }

  test("linear ramp: centered mean recovers the line, zero seasonality") {
    val df = days("a", (0 until 21).map(_ * 10L)).toDF("k", "d", "v")
    val out = Seasonal.decomposeDaily(df, Seq("k"), "d", "v")
      .filter($"trend_micro".isNotNull)
      .orderBy("day")
      .select("v", "trend_micro", "seasonal_micro", "resid_micro")
      .as[(Long, Long, Long, Long)].collect()
    out.foreach { case (v, t, s, r) =>
      assert(t == v * 1000000L) // centered mean of a ramp = its center
      assert(s == 0L && r == 0L)
    }
  }

  test("planted weekly pattern is recovered; residual vanishes") {
    // base 1000, +70 every dow 0 (epoch-mod-7) day: over full windows the
    // trend absorbs the mean bump (+10), the dow deviation the rest (+60)
    val vals = (0 until 28).map { i =>
      val epochDay = java.time.LocalDate.of(2024, 1, 1).plusDays(i).toEpochDay
      if (epochDay % 7 == 0) 1070L else 1000L
    }
    val out = Seasonal.decomposeDaily(
        days("a", vals).toDF("k", "d", "v"), Seq("k"), "d", "v")
      .filter($"trend_micro".isNotNull)
      .select("v", "trend_micro", "seasonal_micro", "resid_micro")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (v, t, s, r) =>
      assert(t == 1010000000L)                      // 1000 + 70/7
      if (v == 1070L) assert(s == 60000000L)        // +60 on the spike dow
      else assert(s == -10000000L)                  // −10 elsewhere
      assert(r == 0L)                               // additive model exact
    }
  }

  test("fewer than 7 days: values emitted, all micro columns null") {
    val df = days("a", Seq(1L, 2L, 3L)).toDF("k", "d", "v")
    val out = Seasonal.decomposeDaily(df, Seq("k"), "d", "v")
    assert(out.count() == 3)
    assert(out.filter($"trend_micro".isNotNull || $"seasonal_micro".isNotNull
      || $"resid_micro".isNotNull).isEmpty)
  }

  test("theilSen: exact slope on a line, one outlier barely moves it (r15)") {
    // perfect line v = 7·t + 3: every pairwise slope is exactly 7
    val line = days("a", (0 until 20).map(i => 7L * i + 3L)).toDF("k", "d", "v")
    val got = Seasonal.theilSen(line, Seq("k"), "d", "v")
      .select("k", "n_pairs", "slope_micro").as[(String, Long, Long)].head()
    assert(got == (("a", 190L, 7000000L)))
    // corrupt ONE day by 10000x: OLS would swing wildly; the slope median
    // moves by at most a rank or two
    val vals = (0 until 20).map(i =>
      if (i == 10) 9999999L else 7L * i + 3L)
    val robust = Seasonal.theilSen(days("a", vals).toDF("k", "d", "v"),
      Seq("k"), "d", "v").select($"slope_micro").as[Long].head()
    assert(math.abs(robust - 7000000L) < 1000000L,
      s"one outlier must not drag the Theil–Sen slope: $robust")
    // reference differential: median of all pairwise slopes, driver-side
    val slopes = (for {
      i <- vals.indices; j <- vals.indices if i < j
    } yield (vals(j) - vals(i)).toDouble / (j - i)).sorted
    val med =
      if (slopes.length % 2 == 1) slopes(slopes.length / 2)
      else (slopes(slopes.length / 2 - 1) + slopes(slopes.length / 2)) / 2.0
    assert(robust == math.floor(med * 1e6 + 0.5).toLong)
    // keys with < 2 days drop out; keys partition independently
    val multi = (days("a", Seq(1L, 3L, 5L)) ++ days("solo", Seq(42L)))
      .toDF("k", "d", "v")
    val byKey = Seasonal.theilSen(multi, Seq("k"), "d", "v")
      .select("k", "slope_micro").as[(String, Long)].collect().toMap
    assert(byKey == Map("a" -> 2000000L))
  }

  test("olsTrend: exact fit on a line (R²=1), outlier sensitivity is the " +
      "theilSen CONTRAST, degenerate keys null (r15)") {
    // v = 7·t + 3 exactly → slope 7, R² = 1; the intercept is at epoch
    // day 0, far left of the series — recover it from the closed form
    val line = days("a", (0 until 20).map(i => 7L * i + 3L)).toDF("k", "d", "v")
    val got = Seasonal.olsTrend(line, Seq("k"), "d", "v")
      .select("k", "n_days", "slope_micro", "r2_micro")
      .as[(String, Long, Long, Long)].head()
    assert(got == (("a", 20L, 7000000L, 1000000L)), s"got $got")
    // ONE corrupted day drags OLS far where theilSen barely moved — the
    // disagreement between the two IS the outlier alarm
    val vals = (0 until 20).map(i =>
      if (i == 10) 9999999L else 7L * i + 3L)
    val corrupted = days("a", vals).toDF("k", "d", "v")
    val ols = Seasonal.olsTrend(corrupted, Seq("k"), "d", "v")
      .select($"slope_micro").as[Long].head()
    val ts = Seasonal.theilSen(corrupted, Seq("k"), "d", "v")
      .select($"slope_micro").as[Long].head()
    assert(math.abs(ols - 7000000L) > 50 * 1000000L,
      s"OLS must swing on the outlier: $ols")
    assert(math.abs(ts - 7000000L) < 1000000L)
    // driver-side closed-form differential over the corrupted series
    val xs = line.select(unix_date($"d").cast("long")).as[Long].collect()
      .sorted.map(_.toDouble)
    val ys = vals.map(_.toDouble)
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(ols / 1e6 - slope) < 1e-4, s"$ols vs $slope")
    // a single-day key has zero x-variance → null estimates, not a crash
    val solo = days("solo", Seq(42L)).toDF("k", "d", "v")
    val r = Seasonal.olsTrend(solo, Seq("k"), "d", "v")
      .select("n_days", "slope_micro", "r2_micro").collect().head
    assert(r.getLong(0) == 1L && r.isNullAt(1) && r.isNullAt(2))
    // partitioning-invariant: exact DECIMAL moments
    val rep = Seasonal.olsTrend(corrupted.repartition(7), Seq("k"), "d", "v")
      .select($"slope_micro").as[Long].head()
    assert(rep == ols)
    // values whose SQUARE exceeds Long.MaxValue: the moment products
    // must form in DECIMAL, not wrap (or ANSI-throw) in Long first —
    // v ≈ 4e9 ⇒ v² ≈ 1.6e19 > 9.2e18 (review fix)
    val big = days("big", (0 until 5).map(i => 4000000000L + 7L * i))
      .toDF("k", "d", "v")
    val bs = Seasonal.olsTrend(big, Seq("k"), "d", "v")
      .select("slope_micro", "r2_micro").as[(Long, Long)].head()
    assert(bs == ((7000000L, 1000000L)), s"exact line at 4e9 scale: $bs")
  }

  // ------------------------------------------------------------- ACF/CCF

  private def dayRows(k: String, vs: Seq[Long]) =
    vs.zipWithIndex.map { case (v, i) =>
      (k, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i.toLong)), v)
    }

  test("autoCorrelation: alternating series — lag 1 = −1, lag 2 = +1; " +
      "period-3 cycle spikes lag 3 (r15)") {
    import spark.implicits._
    val alt = dayRows("alt", Seq(5L, -5L, 5L, -5L, 5L, -5L, 5L, -5L))
      .toDF("k", "d", "v")
    val got = Seasonal.autoCorrelation(alt, Seq("k"), "d", "v", maxLag = 2)
      .select("lag", "corr_micro").as[(Long, Long)].collect().toMap
    assert(got(1L) == -1000000L && got(2L) == 1000000L)
    val cyc = dayRows("c", Seq.tabulate(12)(i => Seq(10L, 2L, 7L)(i % 3)))
      .toDF("k", "d", "v")
    val g3 = Seasonal.autoCorrelation(cyc, Seq("k"), "d", "v", maxLag = 3)
      .select("lag", "corr_micro").as[(Long, Long)].collect().toMap
    assert(g3(3L) == 1000000L, s"period-3 cycle must be exact at lag 3: $g3")
  }

  test("autoCorrelation: constant series and overlap-starved lags report " +
      "NULL; driver-side exact-moment differential; repartition stable") {
    import spark.implicits._
    val const = dayRows("c", Seq.fill(6)(4L)).toDF("k", "d", "v")
    val rows = Seasonal.autoCorrelation(const, Seq("k"), "d", "v", 2)
      .collect()
    assert(rows.forall(_.isNullAt(3)), "zero variance → NULL")
    val rnd = new scala.util.Random(77)
    val vs = Seq.fill(40)(rnd.nextInt(2000).toLong - 1000)
    val df = dayRows("r", vs).toDF("k", "d", "v")
    val got = Seasonal.autoCorrelation(df, Seq("k"), "d", "v", 5)
      .select("lag", "n_pairs", "corr_micro")
      .as[(Long, Long, Long)].collect()
      .map { case (l, n, c) => l -> ((n, c)) }.toMap
    for (lag <- 1 to 5) {
      val a = vs.dropRight(lag); val b = vs.drop(lag)
      val n = a.size
      def bi(x: Seq[Long]) = x.map(BigInt(_))
      val (sa, sb) = (bi(a).sum, bi(b).sum)
      val sab = (bi(a), bi(b)).zipped.map(_ * _).sum
      val saa = bi(a).map(x => x * x).sum
      val sbb = bi(b).map(x => x * x).sum
      val num = (BigInt(n) * sab - sa * sb).toDouble
      val daa = (BigInt(n) * saa - sa * sa).toDouble
      val dbb = (BigInt(n) * sbb - sb * sb).toDouble
      val want = math.floor(num / (math.sqrt(daa) * math.sqrt(dbb)) * 1e6
        + 0.5).toLong
      assert(got(lag.toLong) == ((n.toLong, want)), s"lag $lag")
    }
    val re = Seasonal.autoCorrelation(df.repartition(7), Seq("k"), "d", "v", 5)
      .select("lag", "n_pairs", "corr_micro")
      .as[(Long, Long, Long)].collect()
      .map { case (l, n, c) => l -> ((n, c)) }.toMap
    assert(re == got)
  }

  test("crossCorrelation: a 2-day-shifted copy peaks exactly at lag +2; " +
      "knob guard (r15)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vs = Seq.fill(30)(rnd.nextInt(1000).toLong)
    val a = dayRows("a", vs).toDF("k", "d", "v").drop("k")
    // b(day) = a(day − 2): B repeats A two days LATER → A leads B
    val b = vs.zipWithIndex.map { case (v, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 3)
        .plusDays(i.toLong)), v)
    }.toDF("d", "v")
    val got = Seasonal.crossCorrelation(a, b, "d", "v", maxLag = 4)
      .select("lag", "corr_micro").as[(Long, Long)].collect().toMap
    assert(got(2L) == 1000000L, s"peak must sit at +2: $got")
    assert(got.filter(_._1 != 2L).values.forall(_ < 1000000L))
    intercept[IllegalArgumentException] {
      Seasonal.crossCorrelation(a, b, "d", "v", maxLag = -1)
    }
  }
}
