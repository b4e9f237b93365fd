package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native covariance MOMENT aggregate: one pass over an `array<double>`
  * column accumulates, per (i ≤ j) dimension pair, the exact pico-grain
  * (1e-12) integer sums `Σ⌊xᵢxⱼ·1e12 + ½⌋`, `Σ⌊xᵢ·1e12 + ½⌋` and the row
  * count — the raw moments [[graft.ops.Pca.covariance]] derives the
  * covariance matrix from.
  *
  * WHY: the chained-posexplode formulation materializes d² (i, j, xᵢ, xⱼ)
  * rows PER INPUT ROW before the hash aggregate's partial combine collapses
  * them — correctness-equivalent, but the mapper pays row construction,
  * hashing and group lookup d²/2 times per vector (brutal at d = 1024; the
  * r15 verdict's stated upgrade path). This aggregate walks the array once
  * per row inside a single buffer: d²/2 multiply+floor+add on primitive
  * long arrays, no intermediate rows, shuffle carries ONE buffer per map
  * partition instead of d² accumulator rows per task.
  *
  * DETERMINISM: terms are quantized to pico-grain longs BEFORE summation
  * (commuting integers — the [[graft.ops.Drift.psiDrift]] discipline), and
  * sums accumulate in SIGNED 128-BIT integers (hi/lo long pairs), so the
  * result is the exact integer Σ regardless of partitioning or merge order
  * — bit-identical to the posexplode form's `DECIMAL(38,0)` sums, which is
  * what keeps q233/q234/q235 hashes unchanged across the swap. A per-term
  * long is safe by the same contract as the original (|xᵢxⱼ| ≤ 9e6); the
  * 128-bit accumulator removes the original's implicit row-count bound (a
  * long-only sum of ~1e12-size terms overflows near 9e6 rows — at 100 TB
  * row counts the wider accumulator is the difference between correct and
  * silently wrapped).
  *
  * CONTRACT: all non-null input arrays must share one length (the fixed
  * embedding-dim contract q233 always had — ragged corpora fail LOUDLY
  * instead of producing cells with differing counts) and hold no null
  * elements. NULL arrays are skipped by the caller's filter.
  *
  * @return array<struct<i, j, n, sij, si, sj>> — the upper triangle
  *         (i ≤ j), `si`/`sj` the marginal pico-sums of dimensions i/j,
  *         as DECIMAL(38,0); empty array for zero rows
  */
case class CovMomentsAgg(vec: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CovMomentsBuffer] {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sij", DecimalType(38, 0), nullable = false),
    StructField("si", DecimalType(38, 0), nullable = false),
    StructField("sj", DecimalType(38, 0), nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): CovMomentsBuffer =
    new CovMomentsBuffer

  override def update(buf: CovMomentsBuffer,
                      input: InternalRow): CovMomentsBuffer = {
    val a = vec.eval(input)
    if (a == null) return buf
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val d = arr.numElements()
    if (d == 0) return buf
    buf.ensureDim(d, prettyName)
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"$prettyName: null element at position $i — the fixed-dim " +
          "embedding contract admits no null coordinates")
      x(i) = arr.getDouble(i)
      i += 1
    }
    buf.n += 1L
    i = 0
    var t = 0
    while (i < d) {
      buf.add128(buf.siHi, buf.siLo, i, pico(x(i)))
      var j = i
      while (j < d) {
        buf.add128(buf.sijHi, buf.sijLo, t, pico(x(i) * x(j)))
        t += 1; j += 1
      }
      i += 1
    }
    buf
  }

  // ⌊v·1e12 + ½⌋ as a long — numerically the codegen'd
  // floor(c * 1e12 + 0.5).cast(long) the posexplode form summed
  private def pico(v: Double): Long = math.floor(v * 1e12 + 0.5).toLong

  override def merge(buf: CovMomentsBuffer,
                     other: CovMomentsBuffer): CovMomentsBuffer = {
    if (other.dim == 0) return buf
    buf.ensureDim(other.dim, prettyName)
    buf.n += other.n
    var s = 0
    while (s < buf.dim) {
      buf.merge128(buf.siHi, buf.siLo, s, other.siHi(s), other.siLo(s))
      s += 1
    }
    s = 0
    val tri = buf.sijHi.length
    while (s < tri) {
      buf.merge128(buf.sijHi, buf.sijLo, s, other.sijHi(s), other.sijLo(s))
      s += 1
    }
    buf
  }

  override def eval(buf: CovMomentsBuffer): Any = {
    val d = buf.dim
    val rows = new Array[Any](d * (d + 1) / 2)
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        rows(t) = InternalRow(i.toLong, j.toLong, buf.n,
          dec(buf.sijHi(t), buf.sijLo(t)),
          dec(buf.siHi(i), buf.siLo(i)),
          dec(buf.siHi(j), buf.siLo(j)))
        t += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  // signed 128-bit (hi·2⁶⁴ + unsigned lo) → Decimal(38, 0)
  private def dec(hi: Long, lo: Long): Decimal = {
    val big = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    Decimal(new java.math.BigDecimal(big), 38, 0)
  }

  override def serialize(buf: CovMomentsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.dim)
    out.writeLong(buf.n)
    var i = 0
    while (i < buf.dim) { out.writeLong(buf.siHi(i)); out.writeLong(buf.siLo(i)); i += 1 }
    i = 0
    val tri = if (buf.dim == 0) 0 else buf.sijHi.length
    while (i < tri) { out.writeLong(buf.sijHi(i)); out.writeLong(buf.sijLo(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CovMomentsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new CovMomentsBuffer
    val d = in.readInt()
    val n = in.readLong()
    if (d > 0) {
      buf.ensureDim(d, prettyName)
      buf.n = n
      var i = 0
      while (i < d) { buf.siHi(i) = in.readLong(); buf.siLo(i) = in.readLong(); i += 1 }
      i = 0
      val tri = buf.sijHi.length
      while (i < tri) { buf.sijHi(i) = in.readLong(); buf.sijLo(i) = in.readLong(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CovMomentsAgg =
    copy(vec = newChildren(0))

  override def prettyName: String = "cov_moments"
}

/** Moment buffer: row count + signed 128-bit accumulators (hi/lo long
  * pairs) for the d marginal sums and the d(d+1)/2 upper-triangle product
  * sums. Dimension fixes on the first row; a differing later dimension
  * fails loudly (the fixed-dim contract).
  */
final class CovMomentsBuffer {
  var dim: Int = 0
  var n: Long = 0L
  var siHi: Array[Long] = _
  var siLo: Array[Long] = _
  var sijHi: Array[Long] = _
  var sijLo: Array[Long] = _

  def ensureDim(d: Int, op: String): Unit = {
    if (dim == 0) {
      dim = d
      siHi = new Array[Long](d); siLo = new Array[Long](d)
      val tri = d * (d + 1) / 2
      sijHi = new Array[Long](tri); sijLo = new Array[Long](tri)
    } else if (dim != d) throw new IllegalArgumentException(
      s"$op: mixed embedding dimensions ($dim vs $d) — covariance needs " +
        "a fixed-width vector column")
  }

  /** acc[s] += t (t sign-extended to 128 bits). Carry via the unsigned
    * compare trick: lo-add overflows iff the wrapped result is unsigned-
    * below the addend; the high word adds t's sign extension (t >> 63).
    */
  def add128(hi: Array[Long], lo: Array[Long], s: Int, t: Long): Unit = {
    val newLo = lo(s) + t
    hi(s) += (t >> 63) +
      (if (java.lang.Long.compareUnsigned(newLo, lo(s)) < 0) 1L else 0L)
    lo(s) = newLo
  }

  /** acc[s] += (oHi·2⁶⁴ + unsigned oLo) — full 128-bit merge. */
  def merge128(hi: Array[Long], lo: Array[Long], s: Int,
               oHi: Long, oLo: Long): Unit = {
    val newLo = lo(s) + oLo
    hi(s) += oHi +
      (if (java.lang.Long.compareUnsigned(newLo, lo(s)) < 0) 1L else 0L)
    lo(s) = newLo
  }
}

object CovMomentsAgg {
  /** Column-API entry: `covMoments(col("embedding"))` in an `agg` —
    * returns the upper-triangle moment cells (see [[CovMomentsAgg]]).
    */
  def covMoments(vec: Column): Column = {
    import org.apache.spark.sql.graft.Shim
    Shim.column(CovMomentsAgg(Shim.expression(vec)).toAggregateExpression())
  }
}
