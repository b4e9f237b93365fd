package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("split is exhaustive, disjoint, and stable under repartitioning") {
    val a = Sampling.split(docs, $"doc_id", 800, 100)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.split(docs.repartition(13), $"doc_id", 800, 100)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(a.size == docs.count())
  }

  test("sampleByKey keeps a stable subset of roughly the right size") {
    val s1 = Sampling.sampleByKey(docs, $"doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.sampleByKey(docs.repartition(7), $"doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2)
    val frac = s1.size.toDouble / docs.count()
    assert(frac > 0.15 && frac < 0.45, s"fraction $frac far from 0.3")
  }
}
