package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J6: as-of (backward) join — for each left row, attach the payload of the
  * latest right row with the same key and right.time <= left.time.
  *
  * Not present in the reference (its closest relative is keep-last dedup,
  * /root/reference/extraction.py:105), but natural for the bar/time-series
  * domain and a standard analytics-engine operator.
  *
  * Implementation: union-sort, not join. Tag both sides, union by key+time,
  * and carry the right payload forward with `last(_, ignoreNulls=true)` over
  * (key ORDER BY time, side) rows-unbounded-preceding. Cost is ONE shuffle by
  * key and a per-partition sort — no row explosion, no range-join
  * nested-loop, so it scales linearly to 100 TB where a join+filter+argmax
  * formulation would explode on hot keys. Right rows sort before left rows at
  * equal time (side 0 < 1), giving inclusive `<=` semantics.
  */
object AsOfJoin {

  /** @param left      probe side; all its columns are preserved
    * @param right     reference side; only `key`, `rightTime`, `payload` used
    * @param key       equi key column present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param payload   right columns to attach (null when no prior right row)
    * @param tolerance max allowed left.time − right.time (same units as a
    *                  numeric cast of the time columns); matches older than
    *                  this are nulled, mirroring pandas merge_asof tolerance
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payload: Seq[String],
               tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumns(payload.map(p => s"__p_$p" -> lit(null).cast(right.schema(p).dataType)).toMap)
      .select((Seq(col(key).as("__k"), col("__t"), col("__side")) ++
        payload.map(p => col(s"__p_$p")) ++ leftCols.map(col)): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select((Seq(col(key).as("__k"), col("__t"), col("__side")) ++
        payload.map(p => col(p).as(s"__p_$p")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r).withColumns(
      (payload.map(p => s"__c_$p" -> last(col(s"__p_$p"), ignoreNulls = true).over(w)) :+
        ("__c_rt" -> last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))).toMap)
    val matched = carried.filter(col("__side") === 1)
    val withTol = tolerance match {
      case None => matched
      case Some(tol) =>
        val stale = col("__t").cast("long") - col("__c_rt").cast("long") > tol
        matched.withColumns(payload.map(p =>
          s"__c_$p" -> when(stale, lit(null)).otherwise(col(s"__c_$p"))).toMap)
    }
    withTol.select(
      (leftCols.map(col) ++ payload.map(p => col(s"__c_$p").as(s"asof_$p"))): _*)
  }
}
