package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.HoltScan
import graft.ops.Windows

/** Holt linear-trend scan: bit-equality with an in-JVM reference
  * recursion, null poisoning, codegen/interpreted agreement, and the
  * Windows.holt row-level wrapper's ordering + forecast contract.
  */
class HoltScanSpec extends SparkSpec {
  import spark.implicits._

  /** Reference recursion — the exact op sequence HoltOps.scan runs. */
  private def refHolt(xs: Seq[Double], a: Double,
                      b: Double): Seq[(Double, Double)] = {
    var level = 0.0; var trend = 0.0
    xs.zipWithIndex.map { case (x, i) =>
      if (i == 0) { level = x; trend = 0.0 }
      else {
        val prev = level
        level = a * x + (1 - a) * (level + trend)
        trend = b * (level - prev) + (1 - b) * trend
      }
      (level, trend)
    }
  }

  test("scan equals the reference recursion bit-for-bit") {
    val xs = Seq(3.25, 1.5, -2.75, 8.0, 0.125, 4.5)
    val out = Seq(xs).toDF("v")
      .select(HoltScan(col("v"), 0.3, 0.1).as("h"))
      .selectExpr("transform(h, s -> s.level) AS l",
        "transform(h, s -> s.trend) AS t")
      .as[(Seq[Double], Seq[Double])].head()
    val want = refHolt(xs, 0.3, 0.1)
    assert(out._1 == want.map(_._1)) // exact ==, not approx
    assert(out._2 == want.map(_._2))
  }

  test("a pure-trend series converges to the slope (beta pulls trend to the step)") {
    // x_t = 10t: after warmup the one-step forecast tracks within the ramp
    val xs = (0 until 60).map(_ * 10.0)
    val got = refHolt(xs, 0.5, 0.5)
    assert(math.abs(got.last._2 - 10.0) < 1e-6) // trend ≈ step size
  }

  test("null element poisons its own and every later position") {
    val out = Seq(
      (1, Seq[java.lang.Double](2.0, null, 4.0)),
      (2, Seq.empty[java.lang.Double]),
      (3, null)
    ).toDF("id", "v")
      .select(col("id"), HoltScan(col("v"), 0.5, 0.2).as("h"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Any](1)).toMap
    assert(out(1)(0) != null && out(1)(1) == null && out(1)(2) == null)
    assert(out(2) == Seq.empty)
    assert(out(3) == null)
  }

  test("codegen and interpreted paths agree") {
    val xs = (1 to 50).map(i => (i * 37 % 11).toDouble)
    val df = Seq(xs).toDF("v")
    def run() = df.select(HoltScan(col("v"), 0.0625, 0.25).as("h"))
      .selectExpr("transform(h, s -> s.level) AS l").as[Seq[Double]].head()
    val viaCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(viaCodegen == interp)
    assert(viaCodegen == refHolt(xs, 0.0625, 0.25).map(_._1))
  }

  test("Windows.holt orders per key and emits forecast = level + trend") {
    val df = Seq(
      ("a", 3, 30.0), ("a", 1, 10.0), ("a", 2 ,20.0),
      ("b", 1, 5.0)
    ).toDF("k", "seq", "v")
    val got = Windows.holt(df, Seq("k"), Seq("seq"), "v", 0.3, 0.1)
      .orderBy("k", "seq")
      .select("k", "seq", "v", "level", "trend", "forecast")
      .as[(String, Int, Double, Double, Double, Double)].collect()
    // ordering held: the series fed the scan as 10, 20, 30; outputs are
    // RAW doubles (callers quantize for cross-engine hashing)
    val want = refHolt(Seq(10.0, 20.0, 30.0), 0.3, 0.1)
    got.take(3).zip(want).zipWithIndex.foreach {
      case (((k, seq, _, l, t, f), (wl, wt)), i) =>
        assert(k == "a" && seq == i + 1)
        assert(l == wl, s"level at $i")
        assert(t == wt, s"trend at $i")
        assert(f == wl + wt, s"forecast at $i")
    }
    assert(got(3) == (("b", 1, 5.0, 5.0, 0.0, 5.0)))
  }

  test("alpha/beta bounds are refused loudly") {
    intercept[IllegalArgumentException] {
      Seq(Seq(1.0)).toDF("v").select(HoltScan(col("v"), 0.0, 0.1)).collect()
    }
    intercept[IllegalArgumentException] {
      Seq(Seq(1.0)).toDF("v").select(HoltScan(col("v"), 0.5, 1.5)).collect()
    }
  }
}
