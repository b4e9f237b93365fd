package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Misra–Gries heavy-hitters sketch as a mergeable
  * `TypedImperativeAggregate`: per group, at most `capacity` candidate
  * items with UNDER-estimated counts, such that every item whose true
  * count exceeds n/(capacity+1) is guaranteed present and every estimate
  * satisfies `true − n/(capacity+1) ≤ est ≤ true`. The merge rule is the
  * mergeable-summaries one (Agarwal et al., PODS'12): sum counterparts,
  * then subtract the (capacity+1)-th largest count from everything and
  * drop the non-positive — the combined sketch keeps the SAME error bound
  * over the combined stream, which is exactly what a map-side-combined
  * shuffle needs.
  *
  * WHY A SKETCH: the exact heavy-hitter query ([[graft.ops.Frequency]])
  * shuffles one row per DISTINCT item. Fine for languages or event types;
  * not for URLs, user agents, or n-grams at 100 TB, where the distinct
  * set is itself corpus-sized. This aggregate's state is O(capacity) per
  * group REGARDLESS of cardinality, the shuffle carries only sketches,
  * and the answer is still a guaranteed superset of the true heavy
  * hitters — the standard candidates-then-verify pipeline does one exact
  * semi-join pass afterwards if exact counts are needed.
  *
  * Estimates depend on arrival/merge order (any MG property does), so the
  * output is NOT partitioning-deterministic: it is covered by property
  * tests asserting the guarantees above, not by a row-hash oracle — same
  * contract as the HLL/minhash sketches (q42/q34).
  *
  * @return array<struct<item, est_cnt: long>> sorted est desc, item asc
  */
case class MisraGries(child: Expression, capacity: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] {

  require(capacity >= 1, s"mg_topk needs capacity >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", child.dataType, nullable = false),
    StructField("est_cnt", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ordered = TypeUtils.checkForOrderingExpr(child.dataType, s"$prettyName item")
    if (ordered.isFailure) ordered
    else child.dataType match {
      // The buffer keys items in a HashMap, which needs value-semantics
      // equals/hashCode on the RUNTIME value. BinaryType's Array[Byte] has
      // identity equals (identical items would never merge → the superset
      // guarantee silently breaks), and nested types can arrive as either
      // Unsafe* or Generic* representations whose equals are not mutually
      // compatible. Only flat atomic values are safe map keys.
      case BinaryType => TypeCheckResult.TypeCheckFailure(
        s"$prettyName does not support BINARY items (byte arrays lack " +
          "value-semantics equals/hashCode; hash the column first, e.g. xxhash64)")
      case _: NumericType => TypeCheckResult.TypeCheckSuccess
      case StringType | BooleanType | DateType | TimestampType |
           TimestampNTZType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName does not support ${other.catalogString} items " +
          "(nested runtime values lack stable value-semantics equals/hashCode)")
    }
  }

  @transient private lazy val itemOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)
  @transient private lazy val itemProjection: UnsafeProjection =
    UnsafeProjection.create(Array(child.dataType, LongType: DataType))

  override def createAggregationBuffer(): MGBuffer = new MGBuffer

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v0 = child.eval(input)
    if (v0 != null) {
      val existing = buf.counts.get(v0)
      // put on an existing key replaces only the VALUE — the detached key
      // copy stays, so passing the (possibly buffer-backed) v0 is safe here
      if (existing != null) buf.counts.put(v0, existing + 1L)
      else if (buf.counts.size < capacity)
        buf.counts.put(InternalRow.copyValue(v0), 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  /** The classic MG step (all counters −d, drop zeros) — the "candidate
    * displaced" path. Also the merge trim when d is the (capacity+1)-th
    * largest combined count. O(buffer) = O(capacity).
    */
  private def decrementAll(buf: MGBuffer, d: Long): Unit = {
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
    }
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val existing = buf.counts.get(e.getKey)
      if (existing != null) buf.counts.put(e.getKey, existing + e.getValue)
      else buf.counts.put(e.getKey, e.getValue)
    }
    if (buf.counts.size > capacity) {
      val counts = new Array[Long](buf.counts.size)
      var i = 0
      val vs = buf.counts.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      // (capacity+1)-th largest = index size-capacity-1 ascending
      decrementAll(buf, counts(counts.length - capacity - 1))
    }
    buf
  }

  override def eval(buf: MGBuffer): Any = {
    val entries = new Array[(Any, Long)](buf.counts.size)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    scala.util.Sorting.stableSort(entries, (a: (Any, Long), b: (Any, Long)) =>
      a._2 > b._2 || (a._2 == b._2 && itemOrd.compare(a._1, b._1) < 0))
    new GenericArrayData(entries.map(e => InternalRow(e._1, e._2)))
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val row = itemProjection(InternalRow(e.getKey, e.getValue))
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new MGBuffer
    val row = new UnsafeRow(2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      row.pointTo(b, len)
      // copyValue detaches the item from `b` before the next pointTo
      buf.counts.put(InternalRow.copyValue(row.get(0, child.dataType)),
        row.getLong(1))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren(0))

  override def prettyName: String = "mg_topk"
}

/** item → running count; keys are detached copies (Catalyst reuses row
  * buffers). A boxed HashMap is fine here: the map never exceeds
  * `capacity` entries, and `checkInputDataTypes` restricts items to flat
  * atomic non-binary types, whose runtime values (UTF8String, Decimal,
  * boxed numerics) all have value-semantics equals/hashCode.
  */
final class MGBuffer {
  val counts = new java.util.HashMap[Any, java.lang.Long]()
}

object MisraGries {
  /** Column-API entry: `mgTopK(col("url"), 100)` in an `agg`. */
  def mgTopK(item: Column, capacity: Int): Column = {
    import org.apache.spark.sql.graft.Shim
    Shim.column(MisraGries(Shim.expression(item), capacity)
      .toAggregateExpression())
  }
}
