package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native BOUNDED top-k aggregate: per group, the k largest (score, id)
  * pairs, score descending with id ascending on ties — as a mergeable
  * `TypedImperativeAggregate`, the custom-aggregate tier SURVEY.md §7.3
  * reserves for semantics Spark's built-ins can't express efficiently.
  *
  * WHY: the standard top-k-per-group plan (`row_number` window + filter,
  * `Windows.topNPerKey`) shuffles EVERY row of every group and sorts each
  * partition before discarding all but k — at 100 TB the exchange carries
  * the corpus. This aggregate keeps a k-bounded buffer per group ON THE MAP
  * SIDE, so the shuffle carries at most k pairs per (group × map
  * partition), merge is an O(k) two-pointer pass, and no sort of the full
  * data ever happens. Same results, shuffle volume O(groups × k) instead
  * of O(rows).
  *
  * The buffer is a plain sorted array (insertion into a k-capped sorted
  * array beats a heap for the small k this is for, and keeps eval/merge
  * deterministic); serialization is a compact length-prefixed byte blob.
  * Ties are totally ordered (score desc, id asc), so results are
  * partitioning-independent and oracle-checkable — the window formulation
  * produces the IDENTICAL set (differentially tested).
  *
  * @return array<struct<score: double, id: long>> sorted score desc
  */
case class TopKAgg(score: Expression, id: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, s"top_k needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k needs (double, bigint), got " +
          s"${score.dataType.catalogString} / ${id.dataType.catalogString}")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) {
      buf.insert(other.scores(i), other.ids(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = InternalRow(buf.scores(i), buf.ids(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "top_k"
}

/** k-capped sorted buffer: scores desc, ids asc on equal scores. */
final class TopKBuffer(val k: Int) {
  var size: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  /** True if (s, i) orders strictly before position p's entry. */
  private def before(s: Double, i: Long, p: Int): Boolean =
    s > scores(p) || (s == scores(p) && i < ids(p))

  def insert(s: Double, i: Long): Unit = {
    if (size == k && !before(s, i, k - 1)) return // below the floor: drop
    // find insertion point (buffers are tiny; linear is fine and branch-
    // predictable for the common append-at-floor case scanned from the end)
    var p = math.min(size, k - 1)
    while (p > 0 && before(s, i, p - 1)) p -= 1
    // shift tail right (dropping the floor entry if full)
    val last = math.min(size, k - 1)
    var j = last
    while (j > p) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
    scores(p) = s
    ids(p) = i
    if (size < k) size += 1
  }
}

object TopKAgg {
  /** Column-API entry: `topK(col("score"), col("id"), 10)` in an `agg`. */
  def topK(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.Shim
    Shim.column(TopKAgg(Shim.expression(score), Shim.expression(id), k)
      .toAggregateExpression())
  }
}
