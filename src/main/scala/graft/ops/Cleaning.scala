package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cleaning / standardization operators — the reference's transformation
  * surface re-expressed as single-projection Spark ops.
  *
  * Reference semantics covered:
  *  - column rename (/root/reference/transformation.py:58)
  *  - fixed-schema casts (/root/reference/transformation.py:59-66)
  *  - dtype-driven null fill (/root/reference/transformation.py:81-89)
  *  - derived calendar columns (/root/reference/transformation.py:69-78)
  *  - surrogate id (/root/reference/transformation.py:92) — replaced with a
  *    deterministic key hash; `monotonically_increasing_id` renumbers rows on
  *    every rerun/repartition and silently breaks the reference's own
  *    id-keyed dedup (/root/reference/loading.py:167).
  *
  * All multi-column variants build ONE projection (`withColumns` / single
  * `select`) instead of the reference's N stacked `withColumn` calls, keeping
  * analyzer cost O(1) in plan depth.
  */
object Cleaning {

  /** P3: bulk rename in one pass. */
  def renameColumns(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.select(df.columns.map(c => col(c).as(renames.getOrElse(c, c))).toSeq: _*)

  /** P4: cast the named columns to the given types in one projection. */
  def castColumns(df: DataFrame, casts: Map[String, DataType]): DataFrame =
    df.select(df.columns.map { c =>
      casts.get(c).map(t => col(c).cast(t).as(c)).getOrElse(col(c))
    }.toSeq: _*)

  /** P5: dtype-driven null fill, mirroring transformation.py:81-89:
    * numeric→0, string→"Unknown", date→1970-01-01, timestamp→epoch.
    */
  def fillDefaults(df: DataFrame): DataFrame = {
    val byCol: Map[String, Any] = df.schema.fields.collect {
      case StructField(n, _: DoubleType, _, _)  => n -> 0.0
      case StructField(n, _: FloatType, _, _)   => n -> 0.0
      case StructField(n, _: LongType, _, _)    => n -> 0L
      case StructField(n, _: IntegerType, _, _) => n -> 0
      case StructField(n, _: StringType, _, _)  => n -> "Unknown"
    }.toMap
    val filled = df.na.fill(byCol)
    // na.fill doesn't handle date/timestamp; coalesce those explicitly.
    val dateCols = df.schema.fields.collect {
      case StructField(n, DateType, _, _)      => n -> lit("1970-01-01").cast(DateType)
      case StructField(n, TimestampType, _, _) => n -> lit("1970-01-01 00:00:00").cast(TimestampType)
      case StructField(n, TimestampNTZType, _, _) =>
        n -> lit("1970-01-01 00:00:00").cast(TimestampNTZType)
    }
    if (dateCols.isEmpty) filled
    else filled.withColumns(dateCols.map { case (n, d) => n -> coalesce(col(n), d) }.toMap)
  }

  /** P6 + F1-F3: calendar derivations off a date/timestamp column in one
    * projection (transformation.py:69-75). Weekday via `date_format(_, "EEEE")`
    * — locale-stable under the JVM default we pin in tests; matches DuckDB
    * `dayname()` ("Monday").
    */
  def withCalendar(df: DataFrame, dateCol: String): DataFrame =
    df.withColumns(Map(
      "Year"    -> year(col(dateCol)),
      "Month"   -> month(col(dateCol)),
      "Day"     -> dayofmonth(col(dateCol)),
      "Quarter" -> quarter(col(dateCol)),
      "Weekday" -> date_format(col(dateCol), "EEEE")
    ))

  /** F4 replacement: deterministic 64-bit surrogate id from the logical key.
    * Stable across reruns and repartitioning, unlike
    * `monotonically_increasing_id` (transformation.py:92).
    */
  def deterministicId(keyCols: Column*): Column = xxhash64(keyCols: _*)
}
