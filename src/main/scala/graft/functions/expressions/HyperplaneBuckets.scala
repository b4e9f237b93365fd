package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** All hyperplane-LSH table buckets of a vector in ONE native expression:
  * returns `array<long>` of length `nTables`, element t = the `nBits`-bit
  * sign bucket of the vector against table t's seeded ±1 hyperplanes.
  *
  * Why an expression and not composed `dot(v, typedlit(plane))` columns: the
  * composed form UNROLLS nTables × nBits × dim literal multiplications into
  * generated Java. At production knobs (24 tables × 16 bits × 64 dims ≈ 25k
  * terms) that exceeds Janino's 64 KB method limit, and Spark silently drops
  * the whole stage to interpreted mode — measured as the dominant cost of
  * the LSH near-dup path. Here the planes are a runtime `double[][]` in the
  * references array and the generated code is a constant-size nested loop:
  * always inside whole-stage codegen, O(1) code size at any knob setting.
  *
  * Bit-exact parity: planes are regenerated with the SAME deterministic RNG
  * stream as [[graft.functions.VectorFunctions.hyperplaneBucket]]
  * (`new Random(table * 7919L + bit)`, dim ±1 draws), and each dot product
  * sums left-to-right over element index like [[DotProduct]] — so buckets
  * equal the composed formulation's and the DuckDB oracle's
  * (`list_dot_product` against the same literal planes) exactly.
  *
  * NULL semantics: null input, length ≠ `dim`, or (when the array type
  * admits them) a null element → NULL result.
  */
case class HyperplaneBuckets(child: Expression, nBits: Int, nTables: Int, dim: Int)
    extends UnaryExpression {

  require(nBits > 0 && nBits <= 63, "nBits must be in [1, 63]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hyperplane_buckets needs array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def mayContainNullElements: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  /** planes(t * nBits + j)(i) — identical draw order to
    * VectorFunctions.hyperplaneBucket's literal planes.
    */
  @transient private lazy val planes: Array[Array[Double]] =
    (0 until nTables).flatMap { t =>
      (0 until nBits).map { j =>
        val rnd = new scala.util.Random(t.toLong * 7919 + j)
        Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
      }
    }.toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return null
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val f = isFloat
    val checkNulls = mayContainNullElements
    if (checkNulls) {
      var i = 0
      while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var b = 0L
      var j = 0
      while (j < nBits) {
        val p = planes(t * nBits + j)
        var s = 0.0
        var i = 0
        while (i < dim) {
          s += (if (f) v.getFloat(i).toDouble else v.getDouble(i)) * p(i)
          i += 1
        }
        if (s >= 0) b |= (1L << j)
        j += 1
      }
      out(t) = b
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val out = ctx.freshName("out")
      val nullCheck = if (mayContainNullElements)
        s"""for (int $i = 0; $i < $dim && !${ev.isNull}; $i++)
              if ($a.isNullAt($i)) ${ev.isNull} = true;"""
      else ""
      s"""
        if ($a.numElements() != $dim) {
          ${ev.isNull} = true;
        } else {
          $nullCheck
          if (!${ev.isNull}) {
            long[] $out = new long[$nTables];
            for (int $t = 0; $t < $nTables; $t++) {
              long $b = 0L;
              for (int $j = 0; $j < $nBits; $j++) {
                double[] $p = $planesRef[$t * $nBits + $j];
                double $s = 0.0;
                for (int $i = 0; $i < $dim; $i++) {
                  $s += ((double) $a.$get($i)) * $p[$i];
                }
                if ($s >= 0) $b |= (1L << $j);
              }
              $out[$t] = $b;
            }
            ${ev.value} =
              org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
          }
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  import org.apache.spark.sql.graft.Shim
  /** Column-level entry point. */
  def apply(v: Column, nBits: Int, nTables: Int, dim: Int): Column =
    Shim.column(HyperplaneBuckets(Shim.expression(v), nBits, nTables, dim))
}
