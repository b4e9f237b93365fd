package graft

import org.apache.spark.sql.functions._
import graft.ops.Keywords

/** c-TF-IDF keyword extraction: hand-computed scores, rank order, tie
  * discipline, null hygiene, repartition invariance, no-Window plan.
  */
class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  private def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong

  private val docs = Seq(
    ("A", "apple apple banana"),
    ("B", "banana cherry cherry")
  ).toDF("cls", "text")

  test("cTfIdf: hand case — exact micro scores and ranks (r15)") {
    val got = Keywords.cTfIdf(docs, "cls", "text", topK = 3)
      .as[(String, String, Long, Long)].collect().toSet
    // N_A = N_B = 3, A = 3; every term's f_t = 2 → idf = ln(1 + 3/2)
    val idf = math.log(1.0 + 3.0 / 2.0)
    assert(got == Set(
      ("A", "apple", micro(2.0 / 3 * idf), 1L),
      ("A", "banana", micro(1.0 / 3 * idf), 2L),
      ("B", "cherry", micro(2.0 / 3 * idf), 1L),
      ("B", "banana", micro(1.0 / 3 * idf), 2L)))
  }

  test("cTfIdf: topK cuts, equal scores tie on term ascending") {
    val tied = Seq(("A", "zz aa"), ("B", "aa zz")).toDF("cls", "text")
    val got = Keywords.cTfIdf(tied, "cls", "text", topK = 1)
      .select("cls", "term").as[(String, String)].collect().toSet
    // within each class both terms score identically → 'aa' wins the tie
    assert(got == Set(("A", "aa"), ("B", "aa")))
  }

  test("cTfIdf: class-size normalization — a big class cannot dominate " +
      "by volume alone") {
    val skewed = Seq(
      ("big", Seq.fill(50)("filler common").mkString(" ")),
      ("small", "rare common")
    ).toDF("cls", "text")
    val got = Keywords.cTfIdf(skewed, "cls", "text", topK = 1)
      .select("cls", "term").as[(String, String)].collect().toMap
    // 'rare' is half of the small class — its top term despite 1 count
    assert(got("small") == "rare")
    assert(got("big") == "filler")
  }

  test("cTfIdf: null class / null text rows are excluded; knob guard") {
    val df = Seq(
      (Some("A"), Some("x y")), (None, Some("ignored")),
      (Some("A"), None)
    ).toDF("cls", "text")
    val got = Keywords.cTfIdf(df, "cls", "text", topK = 10)
      .select("term").as[String].collect().toSet
    assert(got == Set("x", "y"))
    intercept[IllegalArgumentException] {
      Keywords.cTfIdf(df, "cls", "text", topK = 0)
    }
  }

  test("cTfIdf: repartition invariance on the real corpus") {
    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
    val a = Keywords.cTfIdf(corpus, "lang", "text", topK = 5)
      .collect().toSet
    val b = Keywords.cTfIdf(corpus.repartition(13), "lang", "text", topK = 5)
      .collect().toSet
    assert(a == b && a.size == 25)
    graft.util.Caches.releaseAll()
  }

  // --------------------------------------------------- PMI collocations

  test("pmiCollocations: hand corpus — the glued pair tops, scores " +
      "replicate exactly (r15)") {
    val docs = Seq(
      "new york is big", "new york is old", "in new york tonight",
      "the city is new", "york minster is old"
    ).toDF("text")
    val got = Keywords.pmiCollocations(docs, "text", minCount = 2, topK = 5)
      .as[(String, String, Long, Long)].collect()
    // replicate: unigrams and adjacent bigrams over the same tokenization
    val toks = Seq("new york is big", "new york is old",
      "in new york tonight", "the city is new", "york minster is old")
      .map(_.split("\\s+").toSeq)
    val cu = toks.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val nu = toks.map(_.size).sum.toDouble
    val cb = toks.flatMap(t => t.zip(t.tail)).groupBy(identity)
      .view.mapValues(_.size).toMap
    val nb = toks.map(_.size - 1).sum.toDouble
    def pmi(a: String, b: String) = math.floor(math.log(
      (cb((a, b)) / nb) / ((cu(a) / nu) * (cu(b) / nu))) * 1e6 + 0.5).toLong
    val nyRow = got.find(r => r._1 == "new" && r._2 == "york").get
    assert(nyRow._3 == 3L && nyRow._4 == pmi("new", "york"))
    assert(got.head._4 == got.map(_._4).max, "ranked by PMI descending")
    // every reported pair clears minCount and replicates
    got.foreach { case (a, b, n, p) =>
      assert(n >= 2 && p == pmi(a, b), s"($a, $b)")
    }
  }

  test("pmiCollocations: minCount gates hapax pairs; knob guards; " +
      "repartition invariance on the real corpus") {
    val docs = Seq("alpha beta", "alpha beta", "gamma delta").toDF("text")
    val got = Keywords.pmiCollocations(docs, "text", minCount = 2, topK = 10)
      .as[(String, String, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == Set(("alpha", "beta")),
      "hapax (gamma, delta) must not report")
    intercept[IllegalArgumentException] {
      Keywords.pmiCollocations(docs, "text", minCount = 0)
    }
    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
    val a = Keywords.pmiCollocations(corpus, "text", 5, 15).collect().toSeq
    val b = Keywords.pmiCollocations(corpus.repartition(9), "text", 5, 15)
      .collect().toSeq
    assert(a.toSet == b.toSet && a.size == 15)
    graft.util.Caches.releaseAll()
  }

  test("plan: the top-k cut is the bounded TopKAgg hash aggregate, " +
      "never a Window sort; class totals broadcast") {
    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
    val df = Keywords.cTfIdf(corpus, "lang", "text", topK = 5)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("Window"), s"no Window sort expected:\n$p")
    assert(p.contains("top_k") || p.contains("TopKAgg"),
      s"TopKAgg cut expected:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"class totals must broadcast:\n$p")
    graft.util.Caches.releaseAll()
  }
}
