package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Whole-table column profiling — the `df.describe()` / `df.isnull().sum()`
  * step every pandas pipeline (the reference included) runs before trusting
  * a feed, as one declarative query: per column, row/null/distinct counts
  * and typed min/max.
  *
  * Output is uniform across column types: numeric and timestamp extremes
  * land in (min_num, max_num) as doubles (timestamps as epoch
  * microseconds — a cast, not a format, so engines agree bit-for-bit);
  * string extremes land in (min_str, max_str). Exactly one of the pairs is
  * populated per row.
  *
  * Scale shape: one aggregate pass PER COLUMN, unioned. That is
  * deliberate — a single pass computing several exact COUNT(DISTINCT)s
  * would plan an Expand (rows × columns amplification before the
  * shuffle), while per-column passes each prune the parquet scan to the
  * ONE column they profile, so total I/O across all passes equals reading
  * the table once and each aggregate stays a plain two-phase
  * partial/final. At 100 TB swap `countDistinct` for
  * `approx_count_distinct` if exact cardinalities aren't required.
  */
object Profile {

  /** @param cols columns to profile (default: all) */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val picked = if (cols.isEmpty) df.columns.toSeq else cols
    picked.map { name =>
      val c = col(name)
      val (minNum, maxNum, minStr, maxStr) = df.schema(name).dataType match {
        case _: NumericType =>
          (min(c).cast("double"), max(c).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case _: TimestampType | _: TimestampNTZType | _: DateType =>
          (unix_micros(min(c).cast("timestamp")).cast("double"),
            unix_micros(max(c).cast("timestamp")).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case _ =>
          (lit(null).cast("double"), lit(null).cast("double"),
            min(c).cast("string"), max(c).cast("string"))
      }
      df.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(c)).as("n_nulls"),
        countDistinct(c).as("n_distinct"),
        minNum.as("min_num"), maxNum.as("max_num"),
        minStr.as("min_str"), maxStr.as("max_str"))
        .select(lit(name).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
    }.reduce(_ unionByName _)
  }
}
