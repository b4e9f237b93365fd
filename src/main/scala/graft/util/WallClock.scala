package graft.util

/** ONE parse for the wall-clock AS OF strings every graft surface accepts
  * (`graft_table`, plain-SQL `TIMESTAMP AS OF`, the change source's
  * `startingTimestamp`): `yyyy-MM-dd[ HH:mm:ss[.SSS]]`, read in the GIVEN
  * zone (callers pass the SESSION zone — the driver sessions pin UTC).
  * Shared so the three call sites cannot silently diverge (review fix —
  * each had its own copy of the LocalDateTime-then-LocalDate fallback).
  */
object WallClock {
  def millis(s: String, zone: java.time.ZoneId): Long = {
    val t = s.trim
    val ldt =
      try java.time.LocalDateTime.parse(t.replace(' ', 'T'))
      catch { case _: java.time.format.DateTimeParseException =>
        java.time.LocalDate.parse(t).atStartOfDay()
      }
    ldt.atZone(zone).toInstant.toEpochMilli
  }

  def sessionZone(spark: org.apache.spark.sql.SparkSession): java.time.ZoneId =
    java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
}
