package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J6: as-of join — for each left row, attach the payload of the latest
  * right row with the same key and right.time <= left.time ([[backward]]),
  * or the earliest with right.time >= left.time ([[forward]]).
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
               tolerance: Option[Column] = None): DataFrame =
    asOf(left, right, key, leftTime, rightTime, payload, tolerance,
      forward = false)

  /** As-of FORWARD join: for each left row, attach the payload of the
    * EARLIEST right row with the same key and right.time >= left.time —
    * "next quote after the order", "first purchase after the click". Same
    * union-sort shape and cost as [[backward]] (one shuffle by key, no row
    * explosion); the window simply looks ahead instead of behind. At equal
    * times the right row matches (inclusive), mirroring backward.
    *
    * @param tolerance max allowed right.time − left.time; farther matches
    *                  are nulled
    */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              payload: Seq[String],
              tolerance: Option[Column] = None): DataFrame =
    asOf(left, right, key, leftTime, rightTime, payload, tolerance,
      forward = true)

  private def asOf(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   payload: Seq[String],
                   tolerance: Option[Column],
                   forward: Boolean): DataFrame = {
    // The internal union-sort columns are reserved: an input already carrying
    // one would be silently clobbered by withColumn and corrupt the join —
    // fail loudly instead.
    val reserved = Set("__t", "__side", "__p", "__k", "__c", "__rt")
    val clash = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(clash.isEmpty,
      s"AsOfJoin reserves internal column names ${reserved.mkString(", ")}; " +
        s"rename input columns: ${clash.mkString(", ")}")
    val leftCols = left.columns.toSeq
    // The whole right payload rides in ONE struct that is non-null exactly
    // on right rows: `last(_, ignoreNulls)` then selects the latest right
    // ROW — not the latest non-null value per column, which would resurrect
    // stale payloads past newer rows whose payload happens to be null and
    // could mix columns from different right rows.
    val payloadStruct = struct(
      (col(rightTime).as("__rt") +: payload.map(p => col(p).as(p))): _*)
    // Tie handling at equal __t is the side ordering: backward puts right
    // rows FIRST (0 < 1) so `last` over the preceding frame sees them —
    // inclusive <=; forward puts right rows AFTER the left row (1 > 0) so
    // `first` over the following frame sees them — inclusive >=.
    val (leftSide, rightSide) = if (forward) (0, 1) else (1, 0)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(leftSide))
      .withColumn("__p", lit(null).cast(
        right.select(payloadStruct).schema.head.dataType))
      .select((Seq(col(key).as("__k"), col("__t"), col("__side"), col("__p")) ++
        leftCols.map(col)): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(rightSide))
      .withColumn("__p", payloadStruct)
      .select((Seq(col(key).as("__k"), col("__t"), col("__side"), col("__p")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val w0 = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
    val pick =
      if (forward)
        first(col("__p"), ignoreNulls = true)
          .over(w0.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col("__p"), ignoreNulls = true)
          .over(w0.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val matched = l.unionByName(r)
      .withColumn("__c", pick)
      .filter(col("__side") === leftSide)
    val effective = tolerance match {
      case None => matched
      case Some(tol) =>
        val gap =
          if (forward) col("__c.__rt").cast("long") - col("__t").cast("long")
          else col("__t").cast("long") - col("__c.__rt").cast("long")
        matched.withColumn("__c", when(gap > tol, lit(null)).otherwise(col("__c")))
    }
    effective.select(
      (leftCols.map(col) ++ payload.map(p => col(s"__c.$p").as(s"asof_$p"))): _*)
  }
}
