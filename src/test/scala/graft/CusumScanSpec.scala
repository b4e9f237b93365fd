package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.CusumScan
import graft.ops.Windows

/** CUSUM scan: bit-equality with a reference recursion, reset-at-zero
  * behavior, null poisoning, codegen/interpreted agreement, and the
  * Windows.cusum wrapper's per-key mean + ordering contract.
  */
class CusumScanSpec extends SparkSpec {
  import spark.implicits._

  private def ref(ds: Seq[Double]): Seq[Double] =
    ds.scanLeft(0.0)((s, d) => math.max(0.0, s + d)).tail

  test("scan equals the reference recursion bit-for-bit; resets at zero") {
    val ds = Seq(2.5, -1.0, -5.0, 3.25, 0.125, -0.5)
    val out = Seq(ds).toDF("d")
      .select(CusumScan(col("d")).as("c")).as[Seq[Double]].head()
    assert(out == ref(ds))
    assert(out(2) == 0.0) // the deep negative clamps to zero, not below
  }

  test("null poisons its own and later positions; codegen agrees") {
    val out = Seq(Seq[java.lang.Double](1.0, null, 2.0)).toDF("d")
      .select(CusumScan(col("d")).as("c"))
      .collect().head.getSeq[java.lang.Double](0)
    assert(out(0) == 1.0 && out(1) == null && out(2) == null)
    val ds = (1 to 40).map(i => ((i * 17 % 9) - 4).toDouble)
    val df = Seq(ds).toDF("d")
    def run() = df.select(CusumScan(col("d")).as("c")).as[Seq[Double]].head()
    val viaCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(viaCodegen == interp && viaCodegen == ref(ds))
  }

  test("Windows.cusum: per-key mean, ordering, and a planted level shift") {
    // key a: flat 100 then a +50 shift — cusum climbs after the shift;
    // mean = 112.5 over 8 points, slack 0
    val rows = (1 to 4).map(i => ("a", i, 100L)) ++
      (5 to 8).map(i => ("a", i, 125L))
    val got = Windows.cusum(rows.toDF("k", "seq", "v"),
        Seq("k"), Seq("seq"), "v", slack = 0.0)
      .orderBy("seq").select("cusum").as[Double].collect()
    val mu = 112.5
    val want = ref(rows.map(_._3.toDouble - mu))
    assert(got.toSeq == want)
    assert(got.last > got.head) // the shift accumulates
  }
}
