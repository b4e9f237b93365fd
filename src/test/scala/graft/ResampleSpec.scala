package graft

import graft.ops.Resample

/** OHLC resample semantics on a hand-checkable bar series. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("monthly OHLC: open=first, close=last, high/low exact, ties by key") {
    val bars = Seq(
      ("A", "2024-01-02", 1L, 10.0),
      ("A", "2024-01-02", 2L, 11.0), // same day, higher tiebreak
      ("A", "2024-01-31", 3L, 7.0),
      ("A", "2024-02-01", 4L, 20.0),
      ("B", "2024-01-05", 5L, 5.0)
    ).toDF("tic", "d", "seq", "px")
      .withColumn("d", $"d".cast("timestamp"))
    val out = Resample.ohlc(bars, "tic", "d", "px", "seq", "month")
      .orderBy("tic", "bucket").collect()
    val aJan = out(0)
    assert(aJan.getAs[Double]("open") == 10.0)  // first by (day, seq)
    assert(aJan.getAs[Double]("close") == 7.0)  // last day wins
    assert(aJan.getAs[Double]("high") == 11.0)
    assert(aJan.getAs[Double]("low") == 7.0)
    assert(aJan.getAs[Long]("n_bars") == 3)
    assert(out(1).getAs[Double]("open") == 20.0) // A Feb
    assert(out(2).getAs[Double]("close") == 5.0) // B Jan
  }

  test("fillDailyForward: spine covers the span, gaps carry the prior value") {
    val bars = Seq(
      ("A", "2024-01-01", 10.0),
      ("A", "2024-01-02", 20.0),
      ("A", "2024-01-05", 50.0), // 2 missing days before this one
      ("B", "2024-03-10", 7.0)   // single-day key: no gaps
    ).toDF("tic", "d", "px").withColumn("d", $"d".cast("timestamp"))
    val out = Resample.fillDailyForward(bars, "tic", "d",
        graft.util.Num.dsum($"px"))
      .orderBy("tic", "day")
      .select($"tic", $"day".cast("string"), $"v_filled", $"is_gap")
      .as[(String, String, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      ("A", "2024-01-01 00:00:00", 10.0, false),
      ("A", "2024-01-02 00:00:00", 20.0, false),
      ("A", "2024-01-03 00:00:00", 20.0, true),
      ("A", "2024-01-04 00:00:00", 20.0, true),
      ("A", "2024-01-05 00:00:00", 50.0, false),
      ("B", "2024-03-10 00:00:00", 7.0, false)))
  }
}
