package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) interval building: turn a change log
  * (one row per observed state) into validity intervals
  * `[valid_from, valid_to)` per key, with `valid_to` NULL on the current row.
  *
  * This is the temporal-table shape a warehouse keeps for the reference's
  * per-ticker price history (extraction.py:105's (Ticker, Date) key): the
  * as-of join ([[AsOfJoin]]) answers "state at time t" against the raw log;
  * SCD2 materializes the same answer as a range table that any engine can
  * serve with a plain `BETWEEN` predicate.
  *
  * Scale shape: one hash shuffle on the key plus a per-key sort — the same
  * cost as any keyed window; no self-join (the naive formulation joins the
  * log to itself on "next change after this one", which is a range join).
  * Ties on the timestamp are broken by `tieBreak` so intervals are total and
  * deterministic; a zero-length interval (two changes in one tick) is kept,
  * matching temporal-table semantics where the later change wins queries at
  * that instant via the half-open bound.
  */
object Scd2 {

  /** One validity interval per change-log row.
    *
    * @param tieBreak columns making (tsCol, tieBreak...) a total order per key
    */
  def intervals(log: DataFrame, keyCols: Seq[String], tsCol: String,
                tieBreak: Seq[String] = Nil): DataFrame = {
    val order: Seq[Column] = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    log
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
