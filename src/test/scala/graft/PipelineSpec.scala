package graft

import org.apache.spark.sql.functions._
import graft.pipeline.FinancePipeline

/** End-to-end reference-pipeline semantics on the FIXTURES.md §A bar fixture:
  * enrich → mergeIncrement (delta wins) → standardize (16-col schema) →
  * loadIncrement (idempotent).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def bars = Seq(
    // Date, Open, High, Low, Close, Volume, Dividends, Stock Splits, Ticker
    ("2024-01-05", 1.0, 2.0, 0.5, 1.5, 100L, 0.0, 0.0, "AAPL"),
    ("2024-01-05", 1.1, 2.1, 0.6, 1.6, 150L, 0.0, 0.0, "MSFT"),
    ("2024-01-08", 1.2, 2.2, 0.7, 1.7, 200L, 0.0, 0.0, "AAPL")
  ).toDF("Date", "Open", "High", "Low", "Close", "Volume", "Dividends",
    "Stock Splits", "Ticker")

  private def companies =
    Seq(("AAPL", "Apple Inc."), ("MSFT", "Microsoft Corp.")).toDF("Ticker", "Company")

  test("mergeIncrement: delta beats history on the (Ticker, Date) key") {
    val history = bars
    val delta = Seq(("2024-01-08", 9.0, 9.0, 9.0, 9.9, 50L, 0.0, 0.0, "AAPL"))
      .toDF("Date", "Open", "High", "Low", "Close", "Volume", "Dividends",
        "Stock Splits", "Ticker")
    val merged = FinancePipeline.mergeIncrement(history, delta)
    assert(merged.count() == 3)
    val jan8 = merged.filter($"Ticker" === "AAPL" && $"Date" === "2024-01-08").head()
    assert(jan8.getAs[Double]("Close") == 9.9) // delta won despite lower Volume
  }

  test("standardize produces the 16-column reference schema, no nulls") {
    val out = FinancePipeline.standardize(
      FinancePipeline.enrich(bars, companies))
    assert(out.columns.toSeq == Seq("id", "Date", "Year", "Month", "Day",
      "Quarter", "Weekday", "Ticker", "Company", "Open", "High", "Low",
      "Close", "Volume", "Dividends", "stock_splits"))
    val r = out.filter($"Ticker" === "AAPL" && $"Day" === 5).head()
    assert(r.getAs[Int]("Year") == 2024 && r.getAs[Int]("Quarter") == 1)
    assert(r.getAs[String]("Weekday") == "Friday")
    assert(r.getAs[String]("Company") == "Apple Inc.")
    assert(out.collect().forall(row => (0 until row.length).forall(!row.isNullAt(_))))
  }

  test("unknown ticker gets Company=Unknown after fill") {
    val noDim = companies.filter($"Ticker" === "nope")
    val out = FinancePipeline.standardize(FinancePipeline.enrich(bars, noDim))
    assert(out.select("Company").distinct().as[String].collect().toSeq == Seq("Unknown"))
  }

  test("typed Dataset[Bar] surface + daily returns derivation") {
    val std = FinancePipeline.standardize(FinancePipeline.enrich(bars, companies))
    val typed = FinancePipeline.asBars(std)
    assert(typed.filter(_.Ticker == "AAPL").count() == 2)
    val rets = FinancePipeline.dailyReturns(typed).collect()
    val aaplJan8 = rets.find(r => r.Ticker == "AAPL" && r.Date.toString == "2024-01-08").get
    assert(aaplJan8.prevClose.contains(1.5))
    assert(math.abs(aaplJan8.ret.get - (1.7 / 1.5 - 1.0)) < 1e-12)
    assert(rets.filter(_.Ticker == "MSFT").head.ret.isEmpty) // first row: no prev
  }

  test("requireNonEmpty passes data through and rejects empty input") {
    assert(FinancePipeline.requireNonEmpty(bars, "t").count() == 3)
    intercept[IllegalArgumentException] {
      FinancePipeline.requireNonEmpty(bars.filter($"Ticker" === "nope"), "t")
    }
  }

  test("loadIncrement is idempotent (load twice ≡ load once)") {
    val std = FinancePipeline.standardize(FinancePipeline.enrich(bars, companies))
    val target = std.filter($"Day" === 5)
    val delta1 = FinancePipeline.loadIncrement(std, target)
    assert(delta1.count() == 1)
    val loaded = target.unionByName(delta1)
    val delta2 = FinancePipeline.loadIncrement(std, loaded)
    assert(delta2.isEmpty)
  }
}
