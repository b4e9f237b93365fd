package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.EmaScan

/** The native linear EMA scan that replaced the O(series²) HOF folds in
  * Windows.ema / Indicators.macd (ADVICE r9): same arithmetic as the fold,
  * so these pin (a) bit-equality with an in-JVM reference recursion, (b)
  * the fold's null-poisoning semantics, (c) codegen/interpreted agreement,
  * and (d) that long series no longer hit the quadratic cliff.
  */
class EmaScanSpec extends SparkSpec {
  import spark.implicits._

  private def refEma(xs: Seq[Double], alpha: Double): Seq[Double] =
    xs.tail.scanLeft(xs.head)((prev, x) => alpha * x + (1 - alpha) * prev)

  test("scan equals the reference recursion bit-for-bit") {
    val xs = Seq(3.25, 1.5, -2.75, 8.0, 0.125, 4.5)
    val out = Seq(xs).toDF("v")
      .select(EmaScan(col("v"), 0.25).as("e"))
      .as[Seq[Double]].head()
    assert(out == refEma(xs, 0.25)) // exact ==, not approx
  }

  test("null element poisons its own and every later position; empty and null arrays pass through") {
    val out = Seq(
      (1, Seq[java.lang.Double](1.0, null, 4.0)),
      (2, Seq.empty[java.lang.Double]),
      (3, null)
    ).toDF("id", "v")
      .select(col("id"), EmaScan(col("v"), 0.5).as("e"))
      .collect().map(r => r.getInt(0) -> r.getSeq[java.lang.Double](1)).toMap
    assert(out(1) == Seq(1.0, null, null))
    assert(out(2) == Seq.empty)
    assert(out(3) == null)
  }

  test("codegen and interpreted paths agree (and SQL registration works)") {
    val xs = (1 to 50).map(i => (i * 37 % 11).toDouble)
    val df = Seq(xs).toDF("v")
    val viaExpr = df.select(EmaScan(col("v"), 0.0625).as("e")).as[Seq[Double]].head()
    // wholestage off forces the interpreted eval path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp =
      try df.select(EmaScan(col("v"), 0.0625).as("e")).as[Seq[Double]].head()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    assert(viaExpr == interp)
    assert(viaExpr == refEma(xs, 0.0625))
  }

  test("a 200k-element series scans in linear time (the old fold was quadratic)") {
    val n = 200000
    val xs = (0 until n).map(i => ((i * 31) % 997).toDouble)
    val t0 = System.nanoTime()
    val out = Seq(xs).toDF("v")
      .select(EmaScan(col("v"), 0.25).as("e")).as[Seq[Double]].head()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.length == n)
    assert(out(n - 1) == refEma(xs, 0.25).last)
    // the concat-fold took minutes at this size; the scan is sub-second of
    // compute — 30 s is pure anti-flake headroom
    assert(sec < 30.0, s"200k-element scan took ${sec}s — quadratic regression?")
  }
}
