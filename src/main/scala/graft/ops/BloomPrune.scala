package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.BinaryType

/** Semi-join reduction via Spark's own bloom-filter sketch — the standard
  * 100 TB trick for joins where the build side is too big to broadcast but
  * its KEY SET still fits a few megabytes of bits: build the filter in one
  * pass over the dim keys, prune the fact table BEFORE its shuffle, then run
  * the real join over the survivors. No false negatives, so
  * `bloomPrunedJoin` is EXACT — false positives only cost wasted shuffle
  * rows that the join discards.
  *
  * Spark ships `BloomFilterAggregate`/`BloomFilterMightContain` for its
  * AQE runtime-filter rule but registers neither in the public function
  * registry, and the rule only fires under size/selectivity heuristics.
  * This operator exposes the same machinery EXPLICITLY (and
  * `plans.GraftExtensions` registers both for SQL users), so a pipeline can
  * pin the reduction where the planner's heuristics would miss it.
  */
object BloomPrune {

  /** Aggregate a bloom filter over `xxhash64(key)` (the input type the
    * sketch requires). Returns the serialized filter as one binary value.
    *
    * NOTE: `BloomFilterAggregate` silently clamps its sizing to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default 4M) and
    * `...maxNumBits` (default 67108864 ≈ 8 MB) — an `expectedItems` beyond
    * the caps builds a saturated filter that prunes nothing while looking
    * healthy. [[bloomPrunedJoin]] validates against the caps; callers using
    * this Column directly must do the same (or raise the confs).
    */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    Shim.column(new BloomFilterAggregate(Shim.expression(xxhash64(key)),
      expectedItems).toAggregateExpression())

  /** Membership probe against a CONSTANT serialized filter (the expression
    * requires a constant or scalar subquery — an attribute-bound column is
    * rejected at analysis).
    */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    Shim.column(BloomFilterMightContain(Literal(bloomBytes, BinaryType),
      Shim.expression(xxhash64(key))))

  /** Inner equi-join with the fact side bloom-pruned before its shuffle.
    *
    * The filter is one aggregated row fetched to the driver and inlined as
    * a literal — the same bytes AQE's runtime filter would carry in a
    * reused subquery, just built unconditionally. Fact rows whose key
    * cannot be in `dim` never enter the join exchange; at a 1000-executor
    * scale that is the difference between shuffling the full fact table
    * and shuffling its matching fraction.
    *
    * @param expectedItems sizes the sketch (Spark allocates 8 bits/item →
    *                      ~1 byte/key) — set to the dim's distinct-key
    *                      estimate. Must not exceed the session's
    *                      runtime-filter caps (see [[bloomAgg]]): the clamp
    *                      is silent and a saturated filter passes every row,
    *                      so over-cap requests fail fast here instead.
    */
  /** Refuse an `expectedItems` the session's sketch caps would silently
    * clamp (a saturated filter prunes nothing while looking healthy) —
    * shared by every caller that builds a filter with [[bloomAgg]].
    */
  def requireWithinCaps(spark: org.apache.spark.sql.SparkSession,
                        expectedItems: Long): Unit = {
    val conf = spark.conf
    val maxItems =
      conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits =
      conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(expectedItems <= maxItems && 8L * expectedItems <= maxBits,
      s"expectedItems=$expectedItems exceeds the session's bloom-filter caps " +
        s"(maxNumItems=$maxItems, maxNumBits=$maxBits bits at 8 bits/item); " +
        "Spark would silently clamp the sketch and a saturated filter prunes " +
        "nothing — raise spark.sql.optimizer.runtime.bloomFilter.maxNumItems/" +
        "maxNumBits or lower expectedItems")
  }

  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      expectedItems: Long = 1000000L): DataFrame = {
    requireWithinCaps(dim.sparkSession, expectedItems)
    val bytes = dim.agg(bloomAgg(col(dimKey), expectedItems).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    fact.filter(mightContain(bytes, col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
