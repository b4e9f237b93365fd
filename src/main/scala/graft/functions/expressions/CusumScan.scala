package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** One-sided CUSUM scan (Page 1954) over an ordered deviation series:
  *
  *   s₀ = max(0, d₀),  sₜ = max(0, sₜ₋₁ + dₜ)
  *
  * The input is the PRE-COMPUTED deviation `dₜ = xₜ − target − slack`
  * (plain plan-level arithmetic — keeping the expression unary means
  * per-key targets/slacks are ordinary columns upstream, and the
  * negative-side detector is the same scan over `−(xₜ − target) − slack`).
  * Downstream, `sₜ > h` is the drift alarm.
  *
  * WHY NATIVE: same reason as [[EmaScan]]/[[HoltScan]] — the recurrence
  * admits no linear-time SQL fold (the HOF emulation copies the
  * accumulator array per element, the ADVICE-r9 quadratic cliff); this
  * is one O(series) codegen'd pass.
  *
  * DETERMINISM: fixed left-to-right IEEE sequence, replayed exactly by
  * a recursive-CTE oracle; NULL semantics mirror the sibling scans (a
  * null deviation poisons its own and every later position).
  */
case class CusumScan(child: Expression) extends UnaryExpression {

  private def containsNull: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def dataType: DataType = ArrayType(DoubleType, containsNull)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cusum_scan needs array<double> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CusumOps.scan(input.asInstanceOf[ArrayData], containsNull)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.CusumOps.scan($c, $containsNull)")

  override protected def withNewChildInternal(newChild: Expression): CusumScan =
    copy(child = newChild)

  override def prettyName: String = "cusum_scan"
}

/** Shared interpreted/codegen loop (static forwarders for codegen). */
object CusumOps {
  def scan(arr: ArrayData, checkNulls: Boolean): ArrayData = {
    val n = arr.numElements()
    if (!checkNulls) {
      val out = new Array[Double](n)
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = arr.getDouble(i)
        s = math.max(0.0, s + d)
        out(i) = s
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      var s = 0.0
      var poisoned = false
      var i = 0
      while (i < n) {
        if (poisoned || arr.isNullAt(i)) {
          poisoned = true
          out(i) = null
        } else {
          s = math.max(0.0, s + arr.getDouble(i))
          out(i) = s
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

object CusumScan {
  import org.apache.spark.sql.graft.Shim
  /** Column-level entry point over pre-computed deviations. */
  def apply(deviations: Column): Column =
    Shim.column(CusumScan(Shim.expression(deviations)))
}
