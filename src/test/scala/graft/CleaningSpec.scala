package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Cleaning

/** Unit coverage for the reference transformation surface (FIXTURES.md §A):
  * rename (transformation.py:58), casts (:59-66), dtype-driven null fill
  * (:81-89), calendar derivations (:69-75), deterministic id (vs :92).
  */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val raw = Seq(
    ("2024-01-05", Some(10.0), Some(100L), Some("AAPL"), Some("Apple Inc.")),
    ("2024-01-06", None, None, Some("MSFT"), None),
    ("2024-01-07", Some(12.5), Some(300L), None, None)
  ).toDF("Date", "Close", "Volume", "Ticker", "Company")

  test("renameColumns renames in one projection") {
    val out = Cleaning.renameColumns(raw, Map("Close" -> "close_px"))
    assert(out.columns.toSeq ==
      Seq("Date", "close_px", "Volume", "Ticker", "Company"))
  }

  test("castColumns applies fixed schema") {
    val out = Cleaning.castColumns(raw, Map("Close" -> FloatType))
    assert(out.schema("Close").dataType == FloatType)
    assert(out.schema("Volume").dataType == LongType)
  }

  test("fillDefaults: numeric→0, string→Unknown, date→epoch; no nulls remain") {
    val withDate = raw.withColumn("Date", to_date($"Date"))
      .withColumn("Date", when($"Ticker".isNull, lit(null).cast(DateType)).otherwise($"Date"))
    val out = Cleaning.fillDefaults(withDate)
    val rows = out.orderBy("Volume").collect()
    assert(!rows.exists(r => (0 until r.length).exists(r.isNullAt)))
    val msft = out.filter($"Ticker" === "MSFT").head()
    assert(msft.getAs[Double]("Close") == 0.0)
    assert(msft.getAs[Long]("Volume") == 0L)
    assert(msft.getAs[String]("Company") == "Unknown")
    val unknownTicker = out.filter($"Ticker" === "Unknown").head()
    assert(unknownTicker.getAs[java.sql.Date]("Date").toString == "1970-01-01")
  }

  test("withCalendar derives Year/Month/Day/Quarter/Weekday") {
    val out = Cleaning.withCalendar(
      Seq("2024-02-05").toDF("d").withColumn("d", to_date($"d")), "d").head()
    assert(out.getAs[Int]("Year") == 2024)
    assert(out.getAs[Int]("Month") == 2)
    assert(out.getAs[Int]("Day") == 5)
    assert(out.getAs[Int]("Quarter") == 1)
    assert(out.getAs[String]("Weekday") == "Monday")
  }

  test("deterministicId is stable across repartitioning") {
    val df = raw.withColumn("id", Cleaning.deterministicId($"Ticker", $"Date"))
    val a = df.orderBy("Date").select("id").as[Long].collect().toSeq
    val b = df.repartition(7).orderBy("Date").select("id").as[Long].collect().toSeq
    assert(a == b)
  }
}
