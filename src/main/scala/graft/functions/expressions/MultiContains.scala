package graft.functions.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring search (Aho & Corasick 1975) — the blocklist
  * screen of a corpus pipeline: which of N phrases (badwords, PII
  * markers, contamination probes) occur in this document, in ONE pass
  * over the text.
  *
  * WHY NATIVE: the SQL alternatives are O(N) passes (`contains` per
  * pattern — N scans of every document) or a single `rlike` over an
  * N-way alternation (regex engines scan with backtracking and the
  * pattern recompiles its NFA state per probe). The automaton walks
  * each character exactly once whatever N is; at 100 TB the text scan
  * is paid once, not per pattern.
  *
  * Semantics: case-sensitive SUBSTRING matching (no word boundaries —
  * compose with tokenization upstream when boundaries matter). Returns
  * the DISTINCT matched patterns in declaration order; a text matching
  * nothing returns an empty array; NULL text is NULL. Duplicate and
  * empty patterns are refused at construction (an empty pattern matches
  * everywhere and the duplicate's hit would be ambiguous).
  *
  * Oracle parity: declaration-order output replays as
  * `list_filter(patterns, p -> contains(text, p))` — exact, no
  * tie-breaking subtleties.
  */
case class MultiContains(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "multi_contains: empty pattern list")
  require(patterns.forall(_.nonEmpty),
    "multi_contains: empty pattern (matches everywhere)")
  require(patterns.distinct.size == patterns.size,
    "multi_contains: duplicate patterns")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_contains needs string, got ${other.catalogString}")
  }

  @transient private lazy val automaton = new AhoCorasick(patterns.toArray)

  override protected def nullSafeEval(input: Any): Any =
    automaton.hits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the automaton is built ONCE per task via the referenced object —
    // the generated code only walks it
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$ac.hits($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiContains =
    copy(child = newChild)

  override def prettyName: String = "multi_contains"
}

/** The classic goto/fail/output automaton, built eagerly on the driver
  * and shipped serialized; `hits` is the per-row walk. BYTE-based: the
  * trie is built over the patterns' UTF-8 bytes and the walk reads the
  * text's bytes in place (`UTF8String.getByte`) — UTF-8 is
  * self-synchronizing, so byte-level substring match ≡ char-level
  * substring match on valid UTF-8, and the per-row `toString` copy the
  * char walk paid (one String + char[] allocation per document) is gone.
  * The per-node map keeps memory proportional to distinct transitions,
  * not alphabet × nodes.
  */
final class AhoCorasick(patterns: Array[String]) extends Serializable {
  // trie: per-node transition map + the pattern indices ending here —
  // construction scaffolding only (@transient: the walk reads the
  // frozen arrays below, so the maps need not ship to executors)
  @transient private val next =
    mutable.ArrayBuffer(mutable.HashMap.empty[Byte, Int])
  @transient private val ends = mutable.ArrayBuffer(List.empty[Int])
  for (pi <- patterns.indices) {
    var node = 0
    for (b <- patterns(pi).getBytes(java.nio.charset.StandardCharsets.UTF_8)) {
      node = next(node).getOrElseUpdate(b, {
        next += mutable.HashMap.empty[Byte, Int]
        ends += Nil
        next.size - 1
      })
    }
    ends(node) ::= pi
  }
  // BFS failure links; output lists merged down the links so a node's
  // `out` is EVERY pattern ending at this text position
  private val fail = Array.fill(next.size)(0)
  @transient private val out = Array.fill[List[Int]](next.size)(Nil)
  locally {
    val queue = mutable.Queue.empty[Int]
    for ((_, c) <- next(0)) { queue += c; out(c) = ends(c) }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      for ((b, child) <- next(r)) {
        queue += child
        var f = fail(r)
        while (f != 0 && !next(f).contains(b)) f = fail(f)
        fail(child) = next(f).get(b).filter(_ != child).getOrElse(0)
        out(child) = ends(child) ::: out(fail(child))
      }
    }
  }
  private val patternUtf8: Array[UTF8String] =
    patterns.map(UTF8String.fromString)

  // the walk's transition tables FROZEN into sorted parallel arrays:
  // the construction-time HashMaps cost an Option allocation and two
  // probes PER BYTE on the hot path (review fix) — binary search over a
  // byte array allocates nothing
  private val transKeys: Array[Array[Byte]] =
    next.map(m => m.keys.toArray.sorted).toArray
  private val transVals: Array[Array[Int]] =
    next.zip(transKeys).map { case (m, ks) => ks.map(m) }.toArray
  private val outArr: Array[Array[Int]] = out.map(_.toArray)

  @inline private def step(node: Int, b: Byte): Int = {
    val idx = java.util.Arrays.binarySearch(transKeys(node), b)
    if (idx >= 0) transVals(node)(idx) else -1
  }

  /** Distinct matched patterns in declaration order. Walks the text's
    * UTF-8 bytes IN PLACE — zero allocation until the result array.
    */
  def hits(text: UTF8String): GenericArrayData = {
    val seen = new Array[Boolean](patternUtf8.length)
    var nSeen = 0
    var node = 0
    var i = 0
    val n = text.numBytes()
    while (i < n && nSeen < patternUtf8.length) {
      val b = text.getByte(i)
      var nxt = step(node, b)
      while (node != 0 && nxt < 0) { node = fail(node); nxt = step(node, b) }
      node = if (nxt >= 0) nxt else 0
      val hs = outArr(node)
      var h = 0
      while (h < hs.length) {
        if (!seen(hs(h))) { seen(hs(h)) = true; nSeen += 1 }
        h += 1
      }
      i += 1
    }
    val result = new Array[Any](nSeen)
    var j = 0
    var k = 0
    while (j < seen.length) {
      if (seen(j)) { result(k) = patternUtf8(j); k += 1 }
      j += 1
    }
    new GenericArrayData(result)
  }
}

object MultiContains {
  import org.apache.spark.sql.graft.Shim
  /** Column-level entry point: `MultiContains(text, blocklist)`. */
  def apply(text: Column, patterns: Seq[String]): Column =
    Shim.column(MultiContains(Shim.expression(text), patterns))
}
