package graft.functions.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy BPE segmentation of ONE word under a fixed merge table — the
  * whole per-word replay (`charSyms` + one [[graft.ops.Bpe.applyMerge]]
  * pass per merge, in merge order) as a single projection.
  *
  * WHY NATIVE: the window-algebra replay is the distributed TRAINING
  * tier's shape — per merge it pays a posexplode, two per-word windows
  * and two self-joins over the vocabulary frame, each round eagerly
  * checkpointed. Training needs that (the argmax is corpus-grain state),
  * but APPLICATION does not: segmenting a word is a pure function of
  * (word, merge table). Replaying N merges as N checkpointed shuffle
  * rounds made every serve-side consumer (token counts, fertility,
  * id encoding, packing) pay ~3 shuffles per merge over the vocabulary;
  * this expression does the identical greedy scan in one codegen'd pass,
  * O(|word| · |merges|) per row, no shuffle at all (r18 perf).
  *
  * Semantics are BIT-IDENTICAL to the window replay, spec-pinned
  * (BpeSpec "expression path ≡ window-algebra path"):
  *  - round-0 symbols are CODE POINTS (Spark `substr` counts characters,
  *    not UTF-16 units), with [[graft.ops.Bpe.EowMarker]] stripped then
  *    appended as the terminal symbol in eow mode — exactly `charSyms`,
  *    including its empty-word edge: non-eow `sequence(1, 0)` runs
  *    descending and yields two empty symbols; eow yields the lone
  *    marker;
  *  - each merge is one greedy LEFT-TO-RIGHT non-overlapping pass (a
  *    taken position consumes its right neighbor; runs like "aaa" under
  *    (a,a) take every other position from the run start) — exactly the
  *    sequential scanner `applyMerge`'s window algebra reproduces and
  *    `trainLocal.applyLocal` already implements.
  */
case class BpeSegmentWord(child: Expression, merges: Seq[(String, String)],
                          eow: Boolean)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_segment_word needs string, got ${other.catalogString}")
  }

  @transient private lazy val segmenter =
    new BpeWordSegmenter(merges.toArray, eow)

  override protected def nullSafeEval(input: Any): Any =
    segmenter.segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the merge table is installed ONCE per task via the referenced
    // object — the generated code only runs the scan
    val seg = ctx.addReferenceObj("bpeSegmenter", segmenter,
      classOf[BpeWordSegmenter].getName)
    defineCodeGen(ctx, ev, c => s"$seg.segment($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegmentWord =
    copy(child = newChild)

  override def prettyName: String = "bpe_segment_word"
}

object BpeSegmentWord {
  import org.apache.spark.sql.graft.Shim
  /** Column-level entry point: `BpeSegmentWord(word, merges, eow)`. */
  def apply(word: Column, merges: Seq[(String, String)],
            eow: Boolean): Column =
    Shim.column(BpeSegmentWord(Shim.expression(word), merges, eow))
}

/** The per-row scanner, built on the driver and shipped serialized. */
class BpeWordSegmenter(merges: Array[(String, String)], eow: Boolean)
    extends Serializable {

  private val marker = graft.ops.Bpe.EowMarker

  def segment(word: UTF8String): GenericArrayData = {
    val w0 = word.toString
    // round-0 symbols, exactly charSyms (code-point chars; eow strips the
    // marker substring then appends the marker symbol; the non-eow empty
    // word reproduces sequence(1, 0)'s descending two-empty-symbol edge)
    var syms: Array[String] = {
      val w = if (eow) w0.replace(marker, "") else w0
      if (!eow && w.isEmpty) Array("", "")
      else {
        val chars = w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp)))
        if (eow) chars :+ marker else chars
      }
    }
    var mi = 0
    while (mi < merges.length) {
      val (a, b) = merges(mi)
      // one greedy left-to-right non-overlapping pass (≡ applyMerge);
      // skip the rebuild when the word contains no match
      var hit = false
      var i = 0
      while (!hit && i + 1 < syms.length) {
        if (syms(i) == a && syms(i + 1) == b) hit = true
        i += 1
      }
      if (hit) {
        val out = mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
      mi += 1
    }
    new GenericArrayData(syms.map(s => UTF8String.fromString(s)))
  }
}
