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

  /** Quarantining read: malformed rows don't kill the job (FAILFAST) and
    * don't silently vanish (DROPMALFORMED) — PERMISSIVE mode lands each
    * bad line's raw text in `_corrupt_record`, so ingest can split the
    * feed into (clean, quarantine) in ONE scan and keep an audit trail,
    * the production posture for third-party files. Returns (good rows
    * with the data columns, bad rows as (raw_line)).
    *
    * Spark only populates `_corrupt_record` for rows materialized WITH
    * the data columns in the same projection (the column is filled at
    * parse time), so the split caches one pass and filters twice.
    */
  def readQuarantined(spark: SparkSession, path: String,
                      schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.StringType
    val withCorrupt = schema.add("_corrupt_record", StringType)
    val raw = graft.util.Caches.cache(
      spark.read.option("header", "true").option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(withCorrupt).csv(path)).toDF
    val good = raw.filter(raw.col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val bad = raw.filter(raw.col("_corrupt_record").isNotNull)
      .select(raw.col("_corrupt_record").as("raw_line"))
    (good, bad)
  }
}
