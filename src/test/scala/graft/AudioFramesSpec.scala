package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.FrameEnergy
import graft.ops.Multimodal

/** FrameEnergy + the audio silence profile: exact per-frame sums,
  * tail-drop and short-payload contracts, codegen/interpreted agreement,
  * and the gaps-and-islands run algebra on crafted payloads.
  */
class AudioFramesSpec extends SparkSpec {
  import spark.implicits._

  /** In-JVM reference: unsigned byte → amplitude −128..127, full frames. */
  private def refEnergies(bytes: Array[Byte], fl: Int): Seq[Long] =
    bytes.grouped(fl).filter(_.length == fl)
      .map(_.map(b => { val a = (b & 0xFF) - 128; a.toLong * a }).sum).toSeq

  test("energies match the reference on exact bytes; tail frame dropped") {
    val payload = Array[Byte](0, 127, -128, 64, 10, 20, 30, 40, 1, 2, 3)
    val got = Seq(Tuple1(payload)).toDF("p")
      .select(FrameEnergy(col("p"), 4).as("e")).as[Seq[Long]].head()
    assert(got == refEnergies(payload, 4))
    assert(got.size == 2) // 11 bytes / 4 → 2 full frames, 3-byte tail gone
  }

  test("shorter than one frame → empty array; null payload → null") {
    val got = Seq((1, Array[Byte](1, 2)), (2, null))
      .toDF("id", "p")
      .select(col("id"), FrameEnergy(col("p"), 8).as("e"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(got(1) == Seq.empty)
    assert(got(2) == null)
  }

  test("codegen and interpreted paths agree") {
    val bytes = (0 until 257).map(i => ((i * 31) % 256).toByte).toArray
    val df = Seq(Tuple1(bytes)).toDF("p")
    def run() =
      df.select(FrameEnergy(col("p"), 16).as("e")).as[Seq[Long]].head()
    val viaCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(viaCodegen == interp)
    assert(viaCodegen == refEnergies(bytes, 16))
  }

  /** Asset rows with a crafted payload: 'x' (120) → amp −8 → energy
    * 64·fl (quiet); ' ' (32) → amp −96 → energy 9216·fl (loud).
    */
  private def asset(id: Long, pattern: String) =
    (id, pattern.flatMap(c => "%c".format(c) * 4).getBytes("UTF-8"))

  test("silence profile: runs, longest, and counts from crafted frames") {
    // frameLen 4 → each pattern char IS one frame; threshold between
    // 64·4=256 (quiet 'x') and 9216·4=36864 (loud ' ')
    val rows = Seq(
      asset(1, "x Lxx L"), // silent frames: [0], [3,4] → 2 runs, longest 2
      asset(2, "xxxx"),    // all silent → 1 run of 4
      asset(3, "LLL"),     // never silent → 0 runs
      (4L, Array[Byte](1, 2)) // sub-frame payload → no frames, no row
    ).toDF("asset_id", "payload")
    val got = Multimodal.silenceProfile(rows, frameLen = 4, threshold = 1000L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // (asset_id, n_frames, n_silent, n_runs, longest, sum_energy)
    assert(got(1L)._2 == 7 && got(1L)._3 == 3 && got(1L)._4 == 2 &&
      got(1L)._5 == 2)
    assert(got(2L) == ((2L, 4L, 4L, 1L, 4L, 4 * 256L)))
    assert(got(3L)._3 == 0 && got(3L)._4 == 0 && got(3L)._5 == 0)
    assert(!got.contains(4L))
  }

  test("energyShots: boundaries at energy jumps, shots are the islands") {
    // frames: x(256) x(256) SPACE(36864) SPACE x — jumps at 1→2 and 3→4
    // with threshold 1000: shots [x,x], [SP,SP], [x] → 3 shots, longest 2
    val rows = Seq(asset(1, "xx  x"), asset(2, "xxxx")).toDF("asset_id", "payload")
    val got = Multimodal.energyShots(rows, frameLen = 4, threshold = 1000L)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 5L, 3L, 2L)))
    assert(got(2L) == ((2L, 4L, 1L, 4L))) // constant energy: one shot
  }

  test("frame rows: per-frame grain with positions, payload read once") {
    val rows = Seq(asset(1, "xL")).toDF("asset_id", "payload")
    val got = Multimodal.audioFrameEnergies(rows, 4)
      .as[(Long, Int, Long)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq == Seq(0, 1))
    assert(got(0)._3 == 4 * 64L)   // 'x' frame
    // 'L' = 76 → amp −52 → 2704 per sample
    assert(got(1)._3 == 4 * 2704L)
  }
}
