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

  test("groupAwareSplit: a near-dup cluster can NEVER straddle the " +
      "train/test boundary; singletons split like Sampling.split (r15)") {
    // 300 docs in 50 six-member groups + 100 singletons
    val ids = (1L to 400L)
    val df = ids.map(i => (i, s"doc-$i")).toDF("doc_id", "text")
    val groups = ids.filter(_ <= 300L)
      .map(i => (i, ((i - 1) / 6) * 6 + 1)) // component = group min id
      .toDF("id", "component")
    val out = Sampling.groupAwareSplit(df, "doc_id", groups, 800, 100)
      .select("doc_id", "group_rep", "split")
      .as[(Long, Long, String)].collect()
    val byDoc = out.map(r => r._1 -> r).toMap
    // every member of a group shares rep AND split — the guarantee
    (1L to 300L).grouped(6).foreach { g =>
      val splits = g.map(byDoc(_)._3).toSet
      val reps = g.map(byDoc(_)._2).toSet
      assert(splits.size == 1 && reps == Set(g.head),
        s"group $g split $splits reps $reps")
    }
    // singletons: rep = own id, label identical to the plain split
    val plain = Sampling.split(df.filter($"doc_id" > 300L), $"doc_id",
        800, 100)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    (301L to 400L).foreach { i =>
      assert(byDoc(i)._2 == i && byDoc(i)._3 == plain(i))
    }
    // the CONTRAST that motivates the operator: per-doc split puts at
    // least one 6-member group across the boundary on this corpus
    val perDoc = Sampling.split(df, $"doc_id", 800, 100)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val straddled = (1L to 300L).grouped(6)
      .count(g => g.map(perDoc(_)).toSet.size > 1)
    assert(straddled > 0,
      "per-doc split must demonstrate the leakage groupAwareSplit prevents")
    // deterministic under repartitioning
    val again = Sampling.groupAwareSplit(df.repartition(7), "doc_id",
        groups.repartition(3), 800, 100)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(again == out.map(r => r._1 -> r._3).toMap)
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

  test("deterministicShuffle: full permutation, repartition-stable, decorrelated") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val out = graft.ops.Sampling.deterministicShuffle(docs, col("doc_id"), 8)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect()
    // every row gets exactly one coordinate; coordinates are dense per shard
    assert(out.length == docs.count())
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // stable under repartitioning
    val again = graft.ops.Sampling
      .deterministicShuffle(docs.repartition(13), col("doc_id"), 8)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // decorrelated with insertion order: the shard-0 stream is not sorted by id
    val stream = out.filter(_._2 == 0).sortBy(_._3).map(_._1).toSeq
    assert(stream != stream.sorted)
  }

  test("packDocs: consecutive greedy fill, ≤1-doc overflow, repartition-stable") {
    import org.apache.spark.sql.functions._
    // ten docs of 5 tokens each ("a b c d e"), one shard, budget 12
    val d = (0L until 10L).map(i => (i, "a b c d e")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.packDocs(df, "doc_id",
          graft.functions.TextFunctions.tokenCount(col("text")), seqLen = 12, shards = 1)
        .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    val got = run(d)
    // cum-before: 0,5,10 → pack 0; 15,20 → pack 1 (floor 15/12=1); 25,30,35 → 2; …
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 2L, 7L -> 2L, 8L -> 3L, 9L -> 3L))
    // packs hold consecutive ids and overflow the 12-token budget by < 1 doc
    val packTokens = got.groupBy(_._2).view.mapValues(_.size * 5)
    assert(packTokens.values.forall(t => t < 12 + 5))
    assert(run(d.repartition(5)) == got, "assignment must not depend on partitioning")
  }

  test("temperatureMix: alpha reweights toward the tail, budgets nest, caps at 1") {
    import org.apache.spark.sql.functions._
    val tok = graft.functions.TextFunctions.tokenCount(col("text"))
    def keptTokens(alpha: Double, target: Long): Map[String, Long] =
      Sampling.temperatureMix(docs, "lang", "doc_id", tok, alpha, target)
        .groupBy("lang").agg(sum(tok).as("t"))
        .as[(String, Long)].collect().toMap
    val natural = docs.groupBy("lang").agg(sum(tok).as("t"))
      .as[(String, Long)].collect().toMap
    val total = natural.values.sum
    // alpha = 1 ≈ natural proportions: every language keeps ~the same
    // fraction of its own tokens (one shared frac = target/total)
    val a1 = keptTokens(1.0, total / 2)
    natural.keys.foreach { l =>
      val f = a1.getOrElse(l, 0L).toDouble / natural(l)
      assert(f > 0.3 && f < 0.7, s"alpha=1 $l kept fraction $f far from 0.5")
    }
    // alpha = 0.3 lifts the tail: the smallest language keeps a LARGER
    // share of its tokens than the largest
    val a03 = keptTokens(0.3, total / 2)
    val big = natural.maxBy(_._2)._1
    val small = natural.minBy(_._2)._1
    assert(a03(small).toDouble / natural(small) >
           a03(big).toDouble / natural(big),
      s"temperature must favor $small over $big: $a03 vs $natural")
    // budgets NEST (scaling-law ladders): the small mix ⊆ the big mix
    def ids(target: Long) =
      Sampling.temperatureMix(docs, "lang", "doc_id", tok, 0.3, target)
        .select("doc_id").as[Long].collect().toSet
    assert(ids(total / 10).subsetOf(ids(total / 2)))
    // a target beyond the corpus caps every fraction at 1 — the full corpus
    assert(ids(total * 10).size == docs.count())
    // repartition-stable membership
    val viaRepart = Sampling.temperatureMix(docs.repartition(7), "lang",
      "doc_id", tok, 0.3, total / 2).select("doc_id").as[Long].collect().toSet
    assert(viaRepart == ids(total / 2))
  }

  // ------------------------------------------------------ rendezvous hash

  test("rendezvousShard: growing S→S+1 moves only the new shard's keys " +
      "(r15)") {
    import graft.functions.{TextFunctions => TF}
    val keys = (1 to 5000).map(i => s"key-$i").toDF("k")
      .withColumn("h", TF.polyHash($"k"))
    val assigned = keys
      .withColumn("s8", Sampling.rendezvousShard($"h", 8))
      .withColumn("s9", Sampling.rendezvousShard($"h", 9))
      .select("s8", "s9").as[(Long, Long)].collect()
    // every mover moved TO the new shard — no key changed between old shards
    assigned.foreach { case (a, b) =>
      assert(a == b || b == 8L, s"illegal move $a → $b")
    }
    val moved = assigned.count { case (a, b) => a != b }.toDouble / assigned.length
    assert(moved > 0.06 && moved < 0.17, s"expected ~1/9 movers, got $moved")
    // rough balance at S=8: every shard gets between half and double fair share
    val byShard = assigned.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byShard.size == 8)
    byShard.values.foreach(n => assert(n > 5000 / 16 && n < 5000 / 4, s"$byShard"))
  }

  test("rendezvousShard: deterministic, repartition-stable, single-shard " +
      "degenerate, knob guard") {
    import graft.functions.{TextFunctions => TF}
    val df = (1 to 500).map(_.toString).toDF("k")
      .withColumn("h", TF.polyHash($"k"))
    val a = df.withColumn("s", Sampling.rendezvousShard($"h", 5))
      .select("k", "s").as[(String, Long)].collect().toMap
    val b = df.repartition(7)
      .withColumn("s", Sampling.rendezvousShard($"h", 5))
      .select("k", "s").as[(String, Long)].collect().toMap
    assert(a == b)
    assert(df.withColumn("s", Sampling.rendezvousShard($"h", 1))
      .select("s").distinct().as[Long].collect().toSeq == Seq(0L))
    intercept[IllegalArgumentException] {
      Sampling.rendezvousShard($"h", 0)
    }
  }

  test("packStats: per-shard pack/doc counts, min/max pack length, " +
      "straddle overflow past the budget, and the fill ratio — " +
      "hand-computed") {
    // shard 0 (even ids): 6,6,6 → starts 0,6,12 → packs 0,0,1 at
    // seqLen 10: lens 12 and 6, overflow 2, fill 18/20
    // shard 1 (odd ids): 4,12 → starts 0,4 → both pack 0: len 16,
    // overflow 6, fill 16/10
    val docs = Seq((0L, 6L), (2L, 6L), (4L, 6L), (1L, 4L), (3L, 12L))
      .toDF("doc_id", "n")
    val out = Sampling.packStats(
      Sampling.packDocs(docs, "doc_id", $"n", seqLen = 10, shards = 2),
      seqLen = 10).collect()
      .map(r => r.getAs[Long]("shard") -> r).toMap
    val s0 = out(0L)
    assert(s0.getAs[Long]("n_packs") == 2L &&
      s0.getAs[Long]("n_docs") == 3L &&
      s0.getAs[Long]("sum_tokens") == 18L &&
      s0.getAs[Long]("min_pack_len") == 6L &&
      s0.getAs[Long]("max_pack_len") == 12L &&
      s0.getAs[Long]("overflow_tokens") == 2L &&
      s0.getAs[Long]("fill_micro") == 900000L, s0.toString)
    val s1 = out(1L)
    assert(s1.getAs[Long]("n_packs") == 1L &&
      s1.getAs[Long]("n_docs") == 2L &&
      s1.getAs[Long]("overflow_tokens") == 6L &&
      s1.getAs[Long]("fill_micro") == 1600000L, s1.toString)
  }
}
