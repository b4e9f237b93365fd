package graft.model

import java.sql.Date

/** Typed row models for the reference's data domain (FIXTURES.md §A) —
  * the `Dataset[T]` surface where compile-time field checks pay off.
  * Schema mirrors /root/reference/transformation.py:93-94 +
  * loading.py:47-64.
  */
final case class RawBar(
    Date: String,
    Open: Option[Double], High: Option[Double], Low: Option[Double],
    Close: Option[Double], Volume: Option[Long],
    Dividends: Option[Double], `Stock Splits`: Option[Double],
    Ticker: Option[String])

final case class Bar(
    id: Long,
    Date: Date,
    Year: Int, Month: Int, Day: Int, Quarter: Int,
    Weekday: String,
    Ticker: String, Company: String,
    Open: Double, High: Double, Low: Double, Close: Double,
    Volume: Long, Dividends: Double, stock_splits: Double)

/** Typed daily return row (windowed derivation over Dataset[Bar]). */
final case class BarReturn(Ticker: String, Date: Date, Close: Double,
    prevClose: Option[Double], ret: Option[Double])
