package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, key-stable sampling and dataset splits — the
  * training-data-pipeline operators that must NOT change membership when
  * the pipeline reruns or repartitions (unlike `df.sample`, whose output
  * depends on partitioning).
  *
  * Buckets come from the first 8 hex digits of md5(key): engine-portable
  * (md5 is identical everywhere, so splits can be re-derived by any system
  * downstream), uniform, and a pure projection — no shuffle, fully
  * pushdown-friendly at 100 TB.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the row key. */
  def deterministicBucket(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Keep a stable `fraction` of rows by key. */
  def sampleByKey(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(deterministicBucket(key, 1000000) < (fraction * 1000000).toLong)

  /** Label every row train/val/test by stable key bucket (per-mille). */
  def split(df: DataFrame, key: Column, trainPerMille: Int, valPerMille: Int,
            as: String = "split"): DataFrame = {
    val b = deterministicBucket(key, 1000)
    df.withColumn(as,
      when(b < trainPerMille, "train")
        .when(b < trainPerMille + valPerMille, "val")
        .otherwise("test"))
  }
}
