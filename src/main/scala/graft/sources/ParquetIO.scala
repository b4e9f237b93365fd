package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet layout management — S4/S5/S8 of SURVEY.md §2.1.
  *
  * The reference writes one unpartitioned parquet dir
  * (/root/reference/transformation.py:98). At 100 TB that forfeits partition
  * pruning, so the engine's canonical layouts are:
  *
  *  - [[writePartitioned]]: hive-style directory partitioning on low-
  *    cardinality columns (Year/Ticker in the reference's domain). Queries
  *    filtering on partition columns scan only matching directories —
  *    `.explain` shows PartitionFilters, not a full scan.
  *  - [[writeBucketed]]: pre-shuffled, hash-bucketed managed table on the
  *    join/agg key. Two tables bucketed on the same key with the same count
  *    join with ZERO exchanges (verified in ParquetIOSpec) — the 100 TB
  *    answer to repeated large-large joins on a stable key.
  */
object ParquetIO {

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed managed table (bucketing requires the table catalog). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }
}
