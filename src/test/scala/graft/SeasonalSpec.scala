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
}
