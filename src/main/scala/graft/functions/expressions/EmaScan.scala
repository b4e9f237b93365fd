package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Native exponential-moving-average scan over an ordered `array<double>`:
  * e₀ = x₀, eₜ = α·xₜ + (1−α)·eₜ₋₁, returning the whole running series.
  *
  * WHY NATIVE: SQL higher-order functions have no linear-time scan — the
  * `aggregate(src, acc, concat(acc, array(next)))` fold this replaces
  * copies the accumulator array on EVERY element, i.e. O(series²) time and
  * allocation per key (ADVICE r9: three such folds inside `macd` hit a
  * quadratic cliff on long per-key tick series well before the documented
  * memory bound). This expression is one O(series) JVM pass with a single
  * output allocation.
  *
  * DETERMINISM: the arithmetic is the same left-to-right double sequence
  * (`α·x + (1−α)·prev`, with `1−α` folded once at plan time exactly as
  * `lit(1 - alpha)` was) as both the Catalyst fold it replaces and the
  * DuckDB `list_reduce` oracle — IEEE 754 makes an identical op sequence
  * bit-identical, so q104/q137 hashes are unchanged.
  *
  * NULL semantics mirror the fold: a null element poisons its own position
  * and (because eₜ depends on eₜ₋₁) every later position; a null array is
  * null. The null-tracking branch is emitted only when the input type
  * admits null elements — the common case is one `UnsafeArrayData`
  * primitive loop with no boxing.
  */
case class EmaScan(child: Expression, alpha: Double) extends UnaryExpression {

  require(alpha > 0 && alpha <= 1, s"ema_scan alpha must be in (0, 1], got $alpha")

  private def containsNull: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def dataType: DataType = ArrayType(DoubleType, containsNull)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ema_scan needs array<double> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    EmaOps.scan(input.asInstanceOf[ArrayData], alpha, containsNull)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // delegate to the same static loop as eval — the per-row work is one
    // array scan, so the win of codegen here is staying INSIDE the
    // surrounding whole-stage pipeline, not inlining the loop body
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.EmaOps.scan($c, $alpha, $containsNull)")

  override protected def withNewChildInternal(newChild: Expression): EmaScan =
    copy(child = newChild)

  override def prettyName: String = "ema_scan"
}

/** The shared interpreted/codegen scan loop (a standalone object gets Java
  * static forwarders, so generated code can call it without `MODULE$`).
  */
object EmaOps {
  def scan(arr: ArrayData, alpha: Double, checkNulls: Boolean): ArrayData = {
    val n = arr.numElements()
    val beta = 1 - alpha
    if (!checkNulls) {
      val out = new Array[Double](n)
      var prev = 0.0
      var i = 0
      while (i < n) {
        val x = arr.getDouble(i)
        prev = if (i == 0) x else alpha * x + beta * prev
        out(i) = prev
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      var prev = 0.0
      var poisoned = false
      var i = 0
      while (i < n) {
        if (poisoned || arr.isNullAt(i)) {
          poisoned = true
          out(i) = null
        } else {
          val x = arr.getDouble(i)
          prev = if (i == 0) x else alpha * x + beta * prev
          out(i) = prev
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

object EmaScan {
  import org.apache.spark.sql.graft.Shim
  /** Column-level entry point: `EmaScan(sortedValues, 0.25)`. */
  def apply(values: Column, alpha: Double): Column =
    Shim.column(EmaScan(Shim.expression(values), alpha))
}
