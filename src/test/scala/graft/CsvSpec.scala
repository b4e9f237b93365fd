package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.sources.CsvIngest

/** S2/S3: CSV sink + fixed-schema and inferred scans
  * (reference: /root/reference/transformation.py:49, extraction.py:116-117).
  */
class CsvSpec extends SparkSpec {
  import spark.implicits._

  test("csv roundtrip with fixed schema preserves values and types") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/out"
    val df = Seq(("AAPL", "2024-01-05", 123.45, 1000L),
      ("MSFT", "2024-01-06", 67.89, 2000L))
      .toDF("Ticker", "Date", "Close", "Volume")
    CsvIngest.write(df, dir)
    val schema = StructType(Seq(
      StructField("Ticker", StringType), StructField("Date", DateType),
      StructField("Close", DoubleType), StructField("Volume", LongType)))
    val back = CsvIngest.read(spark, dir, schema)
    assert(back.schema("Date").dataType == DateType)
    assert(back.count() == 2)
    assert(back.filter($"Ticker" === "AAPL").head().getAs[Double]("Close") == 123.45)
  }

  test("quarantining read splits clean rows from malformed, losing neither") {
    val dir = Files.createTempDirectory("graft_csvq").toString
    val f = new java.io.File(dir, "feed.csv")
    val w = new java.io.PrintWriter(f)
    w.println("sym,px,qty")
    w.println("AAPL,123.45,100")
    w.println("MSFT,not_a_number,200") // malformed px
    w.println("GOOG,99.5,300")
    w.close()
    val schema = StructType(Seq(StructField("sym", StringType),
      StructField("px", DoubleType), StructField("qty", LongType)))
    val (good, bad) = CsvIngest.readQuarantined(spark, f.toString, schema)
    assert(good.select($"sym").as[String].collect().toSet == Set("AAPL", "GOOG"))
    val quarantined = bad.select($"raw_line").as[String].collect().toSeq
    assert(quarantined.size == 1 && quarantined.head.contains("not_a_number"),
      "the raw malformed line must survive for the audit trail")
    graft.util.Caches.releaseAll()
  }

  test("inferred mode reproduces the reference's schema-on-read") {
    val dir = Files.createTempDirectory("graft_csv2").toString + "/out"
    CsvIngest.write(Seq((1, 2.5, "x")).toDF("a", "b", "c"), dir)
    val inferred = CsvIngest.readInferred(spark, dir)
    assert(inferred.schema("a").dataType == IntegerType)
    assert(inferred.schema("b").dataType == DoubleType)
    assert(inferred.schema("c").dataType == StringType)
  }
}
