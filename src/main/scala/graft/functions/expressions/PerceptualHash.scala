package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Perceptual hash of a `binary` payload — the byte-level near-duplicate
  * print for multimodal columns (aHash / dHash over a resampled grayscale
  * grid; the standard image-dedup primitives, computable as deterministic
  * integer arithmetic).
  *
  * Decode contract (the STUB tier of `ops/Multimodal`): the payload is
  * treated as an already-decoded 1-D grayscale strip — byte k is pixel k —
  * resampled into `cells` contiguous equal-width ranges (cell c covers
  * bytes `[floor(c·n/cells), floor((c+1)·n/cells))`). A real image decoder
  * would feed actual W×H pixels through the SAME cell-mean machinery; only
  * this expression's input changes, not the plan or the downstream
  * hamming-banded join.
  *
  *  - aHash (`dMode = false`, cells = 64): bit c = mean(cell c) > global
  *    mean, compared EXACTLY in integers — `sum_c · n > total · len_c` —
  *    so no float rounding can flip a bit between engines.
  *  - dHash (`dMode = true`, cells = 65): bit c = mean(cell c+1) >
  *    mean(cell c), exactly `sum_{c+1} · len_c > sum_c · len_{c+1}`.
  *
  * Both pack 64 bits little-endian (bit c = 1L << c; bit 63 lands in the
  * sign bit — any engine's two's-complement BIGINT holds it). NULL or
  * shorter-than-`cells` payloads → NULL (a strip with empty cells has no
  * meaningful grid). One pass over the bytes, codegen'd, O(1) state — at
  * 100 TB the scan cost IS the byte read.
  *
  * Oracle parity: over an ASCII payload (the stand-in corpus encodes
  * text), byte k equals the codepoint of character k+1, so DuckDB replays
  * the same sums from `string_split(text, '')` + `ascii` — verified by
  * q183/q184.
  */
case class PerceptualHash(child: Expression, dMode: Boolean)
    extends UnaryExpression {

  private val cells: Int = if (dMode) 65 else 64

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"perceptual_hash needs binary, got ${other.catalogString}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return null
    val bytes = a.asInstanceOf[Array[Byte]]
    val n = bytes.length
    if (n < cells) return null
    val sums = new Array[Long](cells)
    val lens = new Array[Long](cells)
    var total = 0L
    var c = 0
    while (c < cells) {
      val from = (c.toLong * n / cells).toInt
      val to = ((c + 1).toLong * n / cells).toInt
      var s = 0L
      var i = from
      while (i < to) { s += bytes(i) & 0xFF; i += 1 }
      sums(c) = s
      lens(c) = to - from
      total += s
      c += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      val set =
        if (dMode) gt128(sums(b + 1), lens(b), sums(b), lens(b + 1))
        else gt128(sums(b), n, total, lens(b))
      if (set) h |= (1L << b)
      b += 1
    }
    h
  }

  /** `a·b > c·d` over non-negative longs WITHOUT overflow: the cross
    * products reach ~255·n²/64, past Long.Max for payloads beyond ~1.5 GB
    * — compare the full 128-bit products instead (review fix; a wrapped
    * compare silently flips hash bits).
    */
  @inline private def gt128(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) > 0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sums = ctx.freshName("sums")
      val lens = ctx.freshName("lens")
      val total = ctx.freshName("total")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val from = ctx.freshName("from")
      val to = ctx.freshName("to")
      val s = ctx.freshName("s")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val set = ctx.freshName("set")
      val hx = ctx.freshName("hx")
      val hy = ctx.freshName("hy")
      // 128-bit cross-product compare, mirroring eval's gt128 (overflow
      // past ~1.5 GB payloads would silently flip bits — review fix)
      def cmp128(a: String, bb: String, c: String, d: String): String =
        s"""long $hx = Math.multiplyHigh($a, $bb);
            long $hy = Math.multiplyHigh($c, $d);
            boolean $set = $hx != $hy ? $hx > $hy
              : Long.compareUnsigned($a * $bb, $c * $d) > 0;"""
      val cmp =
        if (dMode) cmp128(s"$sums[$b + 1]", s"$lens[$b]",
          s"$sums[$b]", s"$lens[$b + 1]")
        else cmp128(s"$sums[$b]", s"(long) $n", s"$total", s"$lens[$b]")
      s"""
        final int $n = $a.length;
        if ($n < $cells) {
          ${ev.isNull} = true;
        } else {
          long[] $sums = new long[$cells];
          long[] $lens = new long[$cells];
          long $total = 0L;
          for (int $c = 0; $c < $cells; $c++) {
            int $from = (int) ((long) $c * $n / $cells);
            int $to = (int) ((long) ($c + 1) * $n / $cells);
            long $s = 0L;
            for (int $i = $from; $i < $to; $i++) $s += $a[$i] & 0xFF;
            $sums[$c] = $s;
            $lens[$c] = $to - $from;
            $total += $s;
          }
          long $h = 0L;
          for (int $b = 0; $b < 64; $b++) {
            $cmp
            if ($set) $h |= (1L << $b);
          }
          ${ev.value} = $h;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PerceptualHash =
    copy(child = newChild)
}

object PerceptualHash {
  import org.apache.spark.sql.graft.Shim

  /** Smallest payload with BOTH prints defined: the dHash grid's 65
    * cells (aHash needs 64). Input-side pre-filters must reference THIS
    * — a hardcoded copy silently desyncs if the grid changes.
    */
  val MinPayloadBytes = 65

  /** 64-bit average hash: cell mean vs global mean over a 64-cell grid. */
  def aHash(payload: Column): Column =
    Shim.column(PerceptualHash(Shim.expression(payload), dMode = false))

  /** 64-bit difference hash: adjacent-cell gradient over a 65-cell grid. */
  def dHash(payload: Column): Column =
    Shim.column(PerceptualHash(Shim.expression(payload), dMode = true))
}
