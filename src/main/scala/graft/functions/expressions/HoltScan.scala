package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Holt linear-trend scan (double exponential smoothing, Holt 1957;
  * Gardner 1985 §3) over an ordered `array<double>`: per position the
  * smoothed LEVEL and TREND, from which the one-step-ahead forecast is
  * `level + trend`.
  *
  *   l₀ = x₀,  b₀ = 0
  *   lₜ = α·xₜ + (1−α)·(lₜ₋₁ + bₜ₋₁)
  *   bₜ = β·(lₜ − lₜ₋₁) + (1−β)·bₜ₋₁
  *
  * The b₀ = 0 init is the lookahead-free convention (x₁ − x₀ needs the
  * NEXT element, which an incremental/streaming producer doesn't have) —
  * callers comparing against textbook series must align on it.
  *
  * WHY NATIVE: the two recurrences are COUPLED — neither is expressible
  * as an independent `list_reduce`-style fold over doubles, and a HOF
  * emulation (fold carrying a growing struct array) pays the same
  * O(series²) copy-per-element cliff that motivated [[EmaScan]]. This is
  * one O(series) JVM pass with a single output allocation.
  *
  * DETERMINISM: a fixed left-to-right IEEE 754 op sequence — the DuckDB
  * oracle replays the identical operand order via a recursive CTE, so
  * rounded outputs compare bit-for-bit.
  *
  * NULL semantics mirror [[EmaScan]]: a null element poisons its own and
  * every later position (both states depend on the previous row); a null
  * array is null.
  */
case class HoltScan(child: Expression, alpha: Double, beta: Double)
  extends UnaryExpression {

  require(alpha > 0 && alpha <= 1,
    s"holt_scan alpha must be in (0, 1], got $alpha")
  require(beta >= 0 && beta <= 1,
    s"holt_scan beta must be in [0, 1], got $beta")

  private def containsNull: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("level", DoubleType, nullable = false),
      StructField("trend", DoubleType, nullable = false))), containsNull)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"holt_scan needs array<double> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HoltOps.scan(input.asInstanceOf[ArrayData], alpha, beta, containsNull)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // same contract as EmaScan: the win is staying inside the surrounding
    // whole-stage pipeline; the loop itself is one static JVM pass
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.HoltOps.scan($c, $alpha, $beta, $containsNull)")

  override protected def withNewChildInternal(newChild: Expression): HoltScan =
    copy(child = newChild)

  override def prettyName: String = "holt_scan"
}

/** Shared interpreted/codegen loop (standalone object → Java static
  * forwarders callable from generated code).
  */
object HoltOps {
  def scan(arr: ArrayData, alpha: Double, beta: Double,
           checkNulls: Boolean): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var level = 0.0
    var trend = 0.0
    var poisoned = false
    var i = 0
    while (i < n) {
      if (checkNulls && (poisoned || arr.isNullAt(i))) {
        poisoned = true
        out(i) = null
      } else {
        val x = arr.getDouble(i)
        if (i == 0) { level = x; trend = 0.0 }
        else {
          val prevLevel = level
          level = alpha * x + (1 - alpha) * (level + trend)
          trend = beta * (level - prevLevel) + (1 - beta) * trend
        }
        out(i) = new GenericInternalRow(Array[Any](level, trend))
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

object HoltScan {
  import org.apache.spark.sql.graft.Shim
  /** Column-level entry point: `HoltScan(sortedValues, 0.3, 0.1)`. */
  def apply(values: Column, alpha: Double, beta: Double): Column =
    Shim.column(HoltScan(Shim.expression(values), alpha, beta))
}
