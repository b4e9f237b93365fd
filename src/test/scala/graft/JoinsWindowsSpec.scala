package graft

import org.apache.spark.sql.functions._
import graft.ops.{Aggregates, BloomPrune, Joins, Windows}

class JoinsWindowsSpec extends SparkSpec {
  import spark.implicits._

  test("broadcastLookup keeps unmatched facts (left) and hits the dim") {
    val fact = Seq(("AAPL", 1.0), ("ZZZZ", 2.0)).toDF("Ticker", "v")
    val dim = Seq(("AAPL", "Apple Inc.")).toDF("Ticker", "Company")
    val out = Joins.broadcastLookup(fact, dim, Seq("Ticker"))
      .orderBy("Ticker").as[(String, Double, Option[String])].collect().toSeq
    assert(out == Seq(("AAPL", 1.0, Some("Apple Inc.")), ("ZZZZ", 2.0, None)))
  }

  test("broadcastLookup plans a broadcast join, not a shuffle join") {
    val fact = spark.read.parquet(s"${sf()}/customer.parquet")
    val dim = spark.read.parquet(s"${sf()}/nation.parquet")
    val plan = Joins.broadcastLookup(fact, dim.withColumnRenamed("n_nationkey", "c_nationkey"),
      Seq("c_nationkey")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("sma computes trailing n-row average exactly") {
    val df = Seq(("k", 1, 1.0), ("k", 2, 2.0), ("k", 3, 3.0), ("k", 4, 4.0))
      .toDF("k", "seq", "v")
    val out = Windows.sma(df, Seq("k"), Seq(col("seq")), "v", 2, "m")
      .orderBy("seq").select("m").as[Double].collect().toSeq
    assert(out == Seq(1.0, 1.5, 2.5, 3.5))
  }

  test("topNPerKey returns deterministic top rows") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0))
      .toDF("k", "id", "v")
    val out = Windows.topNPerKey(df, Seq("k"), Seq(col("v").desc, col("id")), 2)
      .orderBy("k", "rn").select("id").as[Int].collect().toSeq
    assert(out == Seq(2, 3, 4))
  }

  test("vwap composes from built-ins (sum(p*v)/sum(v))") {
    val df = Seq(("k", 10.0, 2.0), ("k", 20.0, 6.0)).toDF("k", "p", "v")
    val out = Aggregates.vwap(df, Seq("k"), "p", "v").select("vwap")
      .as[Double].head()
    assert(math.abs(out - (10 * 2 + 20 * 6) / 8.0) < 1e-9)
  }

  test("rollup adds subtotal and grand-total rows") {
    val df = Seq(("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0)).toDF("f", "g", "v")
    val out = Aggregates.rollupCount(df, Seq("f", "g"), "v")
    assert(out.count() == 3 + 2 + 1) // leaves + per-f + grand total
  }

  test("bloomPrunedJoin ≡ plain join (no false negatives; join removes FPs)") {
    val fact = spark.read.parquet(s"${sf()}/orders.parquet")
      .select("o_orderkey", "o_custkey")
    val dim = spark.read.parquet(s"${sf()}/customer.parquet")
      .filter($"c_mktsegment" === "BUILDING").select("c_custkey")
    val pruned = BloomPrune.bloomPrunedJoin(fact, dim, "o_custkey", "c_custkey",
        expectedItems = 10000L)
      .select("o_orderkey").as[Long].collect().toSet
    val plain = fact.join(dim, $"o_custkey" === $"c_custkey")
      .select("o_orderkey").as[Long].collect().toSet
    assert(pruned == plain && plain.nonEmpty)
  }

  test("bloom probe keeps every dim key (no false negatives on the sketch)") {
    val keys = spark.range(0, 200).toDF("k")
    val bytes = keys.agg(BloomPrune.bloomAgg($"k", 200L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val kept = spark.range(0, 200).toDF("k")
      .filter(BloomPrune.mightContain(bytes, $"k")).count()
    assert(kept == 200L)
  }

  test("ema: seeded with first value, exact recursive fold, key-isolated") {
    val px = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("b", 1L, 100.0)).toDF("k", "t", "v")
    val out = graft.ops.Windows.ema(px, Seq("k"), Seq("t"), "v", alpha = 0.5)
      .select("k", "t", "ema").as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("a", 1L)) == 10.0)
    assert(out(("a", 2L)) == 15.0)   // 0.5*20 + 0.5*10
    assert(out(("a", 3L)) == 22.5)   // 0.5*30 + 0.5*15
    assert(out(("b", 1L)) == 100.0)  // keys never mix
    // order comes from orderCols, not input order
    val shuffled = graft.ops.Windows.ema(px.orderBy($"v".desc), Seq("k"),
        Seq("t"), "v", alpha = 0.5)
      .select("k", "t", "ema").as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(shuffled == out)
  }
}
