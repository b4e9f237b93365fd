package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S2/S3: CSV surface. The reference reads with header + schema inference
  * (/root/reference/transformation.py:49), which costs an extra full scan and
  * yields drifting types; production ingest here is fixed-schema. An
  * inference mode is kept for ad-hoc parity only.
  */
object CsvIngest {

  def read(spark: SparkSession, path: String, schema: StructType,
           dateFormat: String = "yyyy-MM-dd"): DataFrame =
    spark.read.option("header", "true").option("dateFormat", dateFormat)
      .schema(schema).csv(path)

  /** Ad-hoc mode mirroring the reference exactly (double scan — avoid). */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
