package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric helpers for oracle-stable aggregation.
  *
  * Double sums are order-dependent (IEEE addition is not associative), so a
  * Spark hash-aggregate and a DuckDB aggregate over the same rows can differ in
  * the last ulps and break the driver's hash compare. We therefore route money
  * aggregates through exact decimal arithmetic: cast each addend to
  * DECIMAL(38,4) (deterministic nearest-rounding from binary doubles — decimal
  * ties are essentially impossible for binary inputs), sum exactly, and cast
  * the final result back to double. Bit-identical regardless of partitioning,
  * parallelism, or engine.
  *
  * The reference keeps money as doubles end-to-end
  * (/root/reference/transformation.py:60-63); we preserve double as the
  * user-facing type and use decimals only as the exact accumulator.
  */
object Num {
  val Money: DecimalType = DecimalType(38, 4)

  /** Exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast("double")

  /** Exact-sum-based average of a double column, returned as double.
    * Standard SQL AVG semantics: the denominator counts NON-NULL values of
    * `c` (matching [[davgSql]]'s `COUNT(e)`), not all rows.
    */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL fragment computing the same exact sum in DuckDB. */
  def dsumSql(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(38,4))) AS DOUBLE)"

  /** SQL fragment computing the same exact average in DuckDB. */
  def davgSql(e: String): String = s"${dsumSql(e)} / COUNT($e)"
}
