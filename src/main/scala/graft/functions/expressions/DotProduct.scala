package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Σ aᵢ·bᵢ over two numeric array columns, in double precision.
  *
  * This is the benchmark-gated custom `Expression` SURVEY.md §2.10 reserved:
  * the `zip_with` + `aggregate` formulation allocates a lambda frame and an
  * intermediate array per row and does not participate in whole-stage
  * codegen, which dominates similarity-search cost. This expression compiles
  * to a tight primitive loop over the underlying `ArrayData` (no boxing, no
  * intermediate array), with an interpreted fallback that sums in the same
  * left-to-right order — results are bit-identical to the HOF version and to
  * a sequential DuckDB loop, so oracle hashes are unaffected.
  *
  * Mixed float/double element types are read natively (float→double widening
  * is exact) — no upstream cast materializing a second array.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // nullable regardless of children: mismatched lengths / null elements
  // yield NULL even for non-null inputs
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def mayContainNullElements: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  /** NULL semantics match the zip_with/aggregate formulation exactly:
    * mismatched lengths → NULL (zip_with pads with null, which propagates),
    * any null element → NULL. The null-element check is emitted only when
    * the input types admit null elements, so the common non-null hot loop
    * stays branch-free.
    */
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    val checkNulls = mayContainNullElements
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nullCheck = if (mayContainNullElements)
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      else ""
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          for (int $i = 0; $i < $a.numElements(); $i++) {
            $nullCheck
            $s += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
          }
          ${ev.value} = $s;
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  import org.apache.spark.sql.graft.Shim
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    Shim.column(DotProduct(Shim.expression(a), Shim.expression(b)))
}
