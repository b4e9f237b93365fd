package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation — the 100 TB design hook SURVEY.md §7.4(7) calls for
  * (the reference's natural skew: tickers with decades of history vs IPOs).
  *
  * Spark 4's AQE skew-join splitting handles most sort-merge-join skew at
  * runtime; these explicit operators cover the cases AQE does not: skewed
  * AGGREGATION keys, and joins where one hot key dwarfs everything
  * (salting bounds per-task state deterministically).
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) partially, then
    * groupBy key to merge. Bounds any single task's group size by
    * 1/`salts` of the hottest key. `partials` maps column name → partial
    * aggregate; `merges` merges the partials (e.g. sum → sum, count → sum).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
                      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(merges.head, merges.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side against a smaller right side:
    * left rows get a random-ish salt in [0, salts); the right side is
    * replicated `salts` times. Correct for inner/left joins on `key` —
    * every (key, salt) pair on the left finds its replicated right match.
    */
  def saltedJoin(skewedLeft: DataFrame, right: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    val saltedL = skewedLeft.withColumn("__salt",
      pmod(xxhash64(col(key), spark_partition_id(), monotonically_increasing_id()), lit(salts)))
    val expandedR = right.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i).cast("long")): _*)))
    saltedL.join(expandedR, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
