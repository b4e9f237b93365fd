package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
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
  * TYPES: any ORDERABLE score and id type (numeric, decimal, string, date,
  * timestamp, …) — comparisons go through Catalyst's interpreted ordering
  * for the resolved input types, so `top_k(decimal, string)` orders exactly
  * like an `ORDER BY score DESC, id ASC` over the same columns (including
  * NaN-largest double semantics, which is also what the equivalent window
  * form produces). Map/variant and other unorderable types are rejected at
  * analysis time.
  *
  * The buffer is a plain k-capped sorted array (insertion into a small
  * sorted array beats a heap at these sizes and keeps eval/merge
  * deterministic); values are defensively copied on insert because Catalyst
  * reuses row backing buffers. Serialization projects each pair through an
  * `UnsafeProjection` for the input types — the same trick Spark's own
  * `Collect`/`Percentile` aggregates use — length-prefixed into one blob.
  * Ties are totally ordered (score desc, id asc), so results are
  * partitioning-independent and oracle-checkable — the window formulation
  * produces the IDENTICAL set (differentially tested, including a
  * (decimal, string) signature).
  *
  * @return array<struct<score: <scoreType>, id: <idType>>> sorted score desc
  */
case class TopKAgg(score: Expression, id: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, s"top_k needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", score.dataType, nullable = false),
    StructField("id", id.dataType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val s = TypeUtils.checkForOrderingExpr(score.dataType, s"$prettyName score")
    if (s != TypeCheckResult.TypeCheckSuccess) s
    else TypeUtils.checkForOrderingExpr(id.dataType, s"$prettyName id")
  }

  @transient private lazy val scoreOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(score.dataType)
  @transient private lazy val idOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(id.dataType)
  @transient private lazy val pairProjection: UnsafeProjection =
    UnsafeProjection.create(Array(score.dataType, id.dataType))

  /** True if (s, i) orders strictly before buffer position p's entry
    * (score desc, id asc on ties).
    */
  private def before(buf: TopKBuffer, s: Any, i: Any, p: Int): Boolean = {
    val c = scoreOrd.compare(s, buf.scores(p))
    c > 0 || (c == 0 && idOrd.compare(i, buf.ids(p)) < 0)
  }

  private def insert(buf: TopKBuffer, s0: Any, i0: Any): Unit = {
    // fast path: full buffer and the candidate is at-or-below the floor —
    // one compare, no allocation (the overwhelmingly common case once the
    // buffer warms up)
    if (buf.size == k && !before(buf, s0, i0, k - 1)) return
    val s = InternalRow.copyValue(s0)
    val i = InternalRow.copyValue(i0)
    // find insertion point (buffers are tiny; linear from the end is fine)
    var p = math.min(buf.size, k - 1)
    while (p > 0 && before(buf, s, i, p - 1)) p -= 1
    // shift tail right (dropping the floor entry if full)
    val last = math.min(buf.size, k - 1)
    var j = last
    while (j > p) {
      buf.scores(j) = buf.scores(j - 1); buf.ids(j) = buf.ids(j - 1); j -= 1
    }
    buf.scores(p) = s
    buf.ids(p) = i
    if (buf.size < k) buf.size += 1
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) insert(buf, s, i)
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) {
      insert(buf, other.scores(i), other.ids(i))
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
      val row = pairProjection(InternalRow(buf.scores(i), buf.ids(i)))
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k)
    val row = new UnsafeRow(2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      row.pointTo(b, len)
      // entries arrive already sorted and deduped below k, so insert() takes
      // its append path; copyValue inside insert detaches from `b`
      insert(buf, row.get(0, score.dataType), row.get(1, id.dataType))
      i += 1
    }
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

/** k-capped sorted pair buffer: scores desc, ids asc on equal scores.
  * Ordering and insertion live in [[TopKAgg]], where the resolved input
  * types' interpreted orderings are available.
  */
final class TopKBuffer(val k: Int) {
  var size: Int = 0
  val scores: Array[Any] = new Array[Any](k)
  val ids: Array[Any] = new Array[Any](k)
}

object TopKAgg {
  /** Column-API entry: `topK(col("score"), col("id"), 10)` in an `agg`. */
  def topK(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.Shim
    Shim.column(TopKAgg(Shim.expression(score), Shim.expression(id), k)
      .toAggregateExpression())
  }
}
