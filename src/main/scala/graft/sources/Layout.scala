package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout beyond directories and buckets: multi-dimensional
  * clustering (Z-order) and small-file compaction. Neither changes query
  * results — both exist purely so scans at 100 TB touch less data, which is
  * why they are test-verified (files-touched metrics) rather than
  * oracle-registered.
  *
  * Z-ORDER: directory partitioning prunes on ONE dimension chain; queries
  * that range-filter on two independent columns (ts × symbol, price × qty)
  * leave the second predicate to row-group min/max stats, which are useless
  * when the write order is uncorrelated with that column. Sorting by the
  * Z-value — interleaved bits of rank-bucketed dimensions — makes every
  * output file a hyper-rectangle-ish region of the filter space, so BOTH
  * predicates skip whole files/row-groups. The Z-value is a pure projection
  * (width_bucket + shiftleft/bitwise-OR fold — codegen'd, no UDF), and the
  * write is `repartitionByRange(z)` + sort-within: one range shuffle, the
  * same cost as any global sort.
  *
  * COMPACTION: streaming ingests and fine-grained partitions leave thousands
  * of KB-sized files; at 100 TB the scan's task-per-file scheduling and
  * footer reads dominate. [[compact]] rewrites a directory to
  * ceil(bytes/target) files via `coalesce` (no shuffle — coalesce merges
  * existing partitions), writing to a temp dir and swapping atomically-ish
  * (rename) so readers never see a half-written directory.
  */
object Layout {

  /** Z-value: interleave `bits` bits of each column's rank bucket.
    *
    * Each column is first mapped to [0, 2^bits) with `width_bucket` over its
    * observed [min, max] — rank-bucketing copes with arbitrary value
    * distributions (the classic Z-order failure mode is interleaving raw
    * bits of skewed doubles). The per-column (min, max) pair comes in via
    * `ranges` so the projection stays deterministic and driver-computable.
    */
  def zValue(cols: Seq[Column], ranges: Seq[(Double, Double)], bits: Int): Column = {
    val n = 1 << bits
    val buckets = cols.zip(ranges).map { case (c, (lo, hi)) =>
      // width_bucket yields 1..n+1 over [lo, hi]; clamp into 0..n-1
      least(greatest(width_bucket(c.cast("double"), lit(lo), lit(hi), lit(n)) - 1,
        lit(0L)), lit((n - 1).toLong))
    }
    // Interleave: result bit (i*|cols| + j) = bit i of column j's bucket.
    (0 until bits).flatMap { i =>
      buckets.zipWithIndex.map { case (b, j) =>
        shiftleft(b.bitwiseAND(lit(1L << i)), i * cols.length + j - i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` Z-ordered on `zCols` into `files` output files. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    bits: Int = 8, files: Int = 16): Unit = {
    val stats = df.select(zCols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double")))): _*).head()
    val ranges = zCols.indices.map(i => (stats.getDouble(2 * i), stats.getDouble(2 * i + 1)))
    val z = zValue(zCols.map(col), ranges, bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Rewrite a parquet directory into ~`targetBytes` files. Returns the new
    * file count. Partition-directory trees should compact per leaf directory
    * (drive this method once per partition at 100 TB — embarrassingly
    * parallel across partitions).
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long): Int = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(hadoopPath).getLength
    val files = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    spark.read.parquet(path).coalesce(files)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(hadoopPath, true)
    fs.rename(tmp, hadoopPath)
    files
  }
}
