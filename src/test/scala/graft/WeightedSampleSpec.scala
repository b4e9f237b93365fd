package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Weighted sampling via the deterministic exponential race (round 9):
  * determinism, nesting, weight proportionality, and the TopKAgg-backed
  * per-key variant against its window formulation.
  */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def pop = spark.range(0, 4000)
    .select(col("id"), when(col("id") % 2 === 0, lit(10.0))
      .otherwise(lit(1.0)).as("w"))

  test("weightedSample: deterministic, repartition-stable, nested") {
    val s50 = Sampling.weightedSample(pop, col("id"), col("w"), 50)
      .select("id").as[Long].collect().toSeq
    val s50b = Sampling.weightedSample(pop.repartition(13), col("id"), col("w"), 50)
      .select("id").as[Long].collect().toSeq
    assert(s50 == s50b, "sample must not depend on partitioning")
    // nested: the first 20 of the 50-sample ARE the 20-sample
    val s20 = Sampling.weightedSample(pop, col("id"), col("w"), 20)
      .select("id").as[Long].collect().toSeq
    assert(s50.take(20) == s20)
  }

  test("weightedSample: heavier rows win proportionally; w <= 0 excluded") {
    // half the population at weight 10, half at 1 → expect ≈ 10/11 of the
    // sample to be heavy; at n=200 a 70% floor is > 6 sigma away
    val s = Sampling.weightedSample(pop, col("id"), col("w"), 200)
      .select("id").as[Long].collect()
    val heavy = s.count(_ % 2 == 0)
    assert(heavy > 140, s"heavy rows underrepresented: $heavy/200")
    // zero/negative weights can never be sampled
    val withBad = pop.withColumn("w",
      when(col("id") < 2000, lit(-1.0)).otherwise(col("w")))
    val s2 = Sampling.weightedSample(withBad, col("id"), col("w"), 100)
      .select("id").as[Long].collect()
    assert(s2.forall(_ >= 2000))
  }

  test("weightedSamplePerKey ≡ the window formulation (same race, same ties)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val agg = Sampling.weightedSamplePerKey(docs, col("lang"), col("doc_id"),
      col("n_chars"), 5)
      .select($"stratum", $"rnk", $"id", $"priority")
      .as[(String, Int, Long, Double)].collect().toSet
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(0.5d)) / lit(4294967296.0d)
    val win = docs.filter(col("n_chars") > 0)
      .select(col("lang").as("stratum"), col("doc_id").as("id"),
        round(-log(u) / col("n_chars").cast("double"), 9).as("priority"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("stratum").orderBy(col("priority"), col("id"))).cast("int"))
      .filter(col("rnk") <= 5)
      .select($"stratum", $"rnk", $"id", $"priority")
      .as[(String, Int, Long, Double)].collect().toSet
    assert(agg == win && agg.nonEmpty)
  }
}
