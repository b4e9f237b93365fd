package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Per-frame signal energy of a `binary` payload — the audio tier of the
  * multimodal column toolkit (silence detection, activity segmentation,
  * energy-envelope features), computable as deterministic integer
  * arithmetic.
  *
  * Decode contract (the STUB tier of `ops/Multimodal`, same convention
  * as [[PerceptualHash]]): the payload is an already-decoded unsigned
  * 8-bit PCM stream — byte k is sample k, amplitude `(byte & 0xFF) − 128`
  * in [−128, 127]. A real audio decoder (16-bit PCM, resampling) would
  * feed this same expression's machinery; only the byte source changes,
  * not the plan or the downstream window algebra.
  *
  * Output: one `BIGINT` per FULL frame — frame f covers bytes
  * `[f·frameLen, (f+1)·frameLen)` and its energy is the sum of squared
  * amplitudes (max 128²·frameLen, far under Long overflow for any sane
  * frame). A trailing partial frame is DROPPED (a fixed-length energy
  * grid is the contract; a short tail would read as artificial silence).
  * A payload shorter than one frame yields an EMPTY array — zero frames
  * is an answer, not a missing one; only a NULL payload is NULL.
  *
  * One codegen'd pass over the bytes, O(1) state beyond the output —
  * at 100 TB the cost is the byte scan itself.
  *
  * Oracle parity: over an ASCII stand-in payload, byte k is the
  * codepoint of character k+1, so DuckDB replays each frame's sum from
  * `ascii` + list slices — exact integers, no rounding anywhere.
  */
case class FrameEnergy(child: Expression, frameLen: Int)
    extends UnaryExpression {

  require(frameLen >= 1, s"frame_energy frameLen must be >= 1, got $frameLen")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"frame_energy needs binary, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    FrameEnergyOps.energies(input.asInstanceOf[Array[Byte]], frameLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call per row (the loop is the whole work) — staying
    // inside the surrounding whole-stage pipeline is the codegen win
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.FrameEnergyOps.energies($c, $frameLen)")

  override protected def withNewChildInternal(newChild: Expression): FrameEnergy =
    copy(child = newChild)

  override def prettyName: String = "frame_energy"
}

/** Shared interpreted/codegen loop (standalone object → Java static
  * forwarders callable from generated code).
  */
object FrameEnergyOps {
  def energies(bytes: Array[Byte], frameLen: Int): UnsafeArrayData = {
    val nFrames = bytes.length / frameLen
    val out = new Array[Long](nFrames)
    var f = 0
    while (f < nFrames) {
      var s = 0L
      var i = f * frameLen
      val to = i + frameLen
      while (i < to) {
        val amp = (bytes(i) & 0xFF) - 128
        s += amp.toLong * amp
        i += 1
      }
      out(f) = s
      f += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object FrameEnergy {
  import org.apache.spark.sql.graft.Shim
  /** Column-level entry point: `FrameEnergy(payload, 32)`. */
  def apply(payload: Column, frameLen: Int): Column =
    Shim.column(FrameEnergy(Shim.expression(payload), frameLen))
}
