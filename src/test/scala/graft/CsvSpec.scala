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

  test("inferred mode reproduces the reference's schema-on-read") {
    val dir = Files.createTempDirectory("graft_csv2").toString + "/out"
    CsvIngest.write(Seq((1, 2.5, "x")).toDF("a", "b", "c"), dir)
    val inferred = CsvIngest.readInferred(spark, dir)
    assert(inferred.schema("a").dataType == IntegerType)
    assert(inferred.schema("b").dataType == DoubleType)
    assert(inferred.schema("c").dataType == StringType)
  }
}
