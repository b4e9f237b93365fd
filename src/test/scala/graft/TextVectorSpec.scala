package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.ops.{MinHashDedup, SimHashDedup, Similarity}

class TextVectorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text with no overlap here at all"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, ""),
    (6L, "one two")
  ).toDF("doc_id", "text")

  test("tokens / tokenCount edge cases") {
    val out = docs.select($"doc_id", TF.tokenCount($"text").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(out(1L) == 9)
    assert(out(5L) == 0)
    assert(out(6L) == 2)
  }

  test("shingles: empty when fewer tokens than n") {
    val out = docs.select($"doc_id",
        size(TF.shingles(TF.tokens($"text"), 3)).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(out(6L) == 0)
    assert(out(1L) == 7) // 9 tokens → 7 trigrams ("the" repeats but trigrams distinct)
  }

  test("fingerprint: identical docs identical, different docs differ") {
    val fp = docs.select($"doc_id", TF.fingerprint(TF.tokens($"text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(4L))
    assert(fp(1L) != fp(2L))
    assert(fp.values.forall(v => v >= 0 && v < 1000000007L))
  }

  test("minhash finds the exact-dup pair with jaccard 1.0") {
    val pairs = MinHashDedup.nearDupPairs(docs, "doc_id", "text",
        shingleN = 3, k = 16, b = 8, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 1.0))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("simhash: identical docs at distance 0, disjoint docs far") {
    val pairs = SimHashDedup.nearDupPairs(docs, "doc_id", "text", maxDist = 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 0))
  }

  test("polyHash: deterministic char fold, bounded, empty → 0") {
    val got = Seq("hello", "", "Ab9").toDF("t")
      .select(TF.polyHash($"t")).as[Long].collect().toSeq
    // reference values hand-computed (and replayed in DuckDB by the
    // oracle helper): fold h*31 + codepoint mod 1e9+7
    assert(got == Seq(99162322L, 0L, 65560L))
  }

  test("portable fingerprint: identical docs identical, bounded") {
    val fp = docs.select($"doc_id",
        TF.fingerprintPortable(TF.tokens($"text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(4L))
    assert(fp(1L) != fp(2L))
    assert(fp.values.forall(v => v >= 0 && v < 1000000007L))
  }

  test("portable minhash finds the exact-dup pair with jaccard 1.0") {
    val pairs = MinHashDedup.nearDupPairsPortable(docs, "doc_id", "text",
        shingleN = 3, k = 16, b = 8, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 1.0))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("portable simhash: identical docs at distance 0, prints in [0, 2^60)") {
    val pairs = SimHashDedup.nearDupPairsPortable(docs, "doc_id", "text",
        maxDist = 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 0))
    val prints = SimHashDedup.simhashPrintsPortable(docs, "doc_id", "text")
      .select($"sh").as[Long].collect()
    assert(prints.forall(p => p >= 0L && p < (1L << 60)))
  }

  test("portable hashEmbed: exact dup cosine 1.0, disjoint doc excluded") {
    import graft.ops.TextEmbed
    val pairs = TextEmbed.cosineNearDupDocs(docs, "doc_id", "text",
        dim = 32, threshold = 0.8, portable = true)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 1.0))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("cosine: exact on known vectors") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 1.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val got = df.select(VF.cosine($"a", $"b")).as[Double].collect().toSeq
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(got(2) == 0.0) // zero vector → 0, not NaN
  }

  test("native DotProduct is bit-identical to the HOF formulation") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet").limit(100)
    val both = emb.crossJoin(emb.select($"embedding".as("e2")).limit(20))
      .select(VF.dot($"embedding", $"e2").as("native"),
        VF.dotHof($"embedding", $"e2").as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
  }

  test("bruteForceTopK is deterministic and self-excluding") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val out = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 3), 2)
    val rows = out.collect()
    assert(rows.length == 6)
    assert(rows.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("nn_id")))
  }

  test("hashEmbed: near-identical docs cosine-close, disjoint docs far") {
    import graft.ops.TextEmbed
    val pairs = TextEmbed.cosineNearDupDocs(docs, "doc_id", "text",
        dim = 32, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 1.0)) // exact dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))               // disjoint doc
  }

  test("langId deterministic argmax with tie rule") {
    val markers = Seq("x" -> Seq("xx"), "y" -> Seq("yy"))
    val df = Seq("xx yy", "yy yy xx", "zz").toDF("t")
    val got = df.select(TF.langId(TF.tokens($"t"), markers)).as[String].collect().toSeq
    assert(got == Seq("x", "y", "und")) // tie → first marker set wins
  }

  test("repetition metrics: dup n-gram / dup line fractions on planted cases") {
    val df = Seq(
      (1L, "a b a b a b"),                    // bigrams: ab,ba,ab,ba,ab → 5 with 2 distinct
      (2L, "all distinct words here"),        // no repeats
      (3L, ""),                               // blank
      (4L, "x\ny\nx\n\n y ")                  // lines x,y,x,y → 2 dups of 4
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id",
        TF.dupNgramFraction(TF.tokens($"text"), 2).as("g2"),
        TF.dupLineFraction($"text").as("dl"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 == 3.0 / 5)
    assert(got(2L)._1 == 0.0)
    assert(got(3L) == ((0.0, 0.0)))
    assert(got(4L)._2 == 2.0 / 4)
  }

  test("redactPii scrubs emails and long digit runs, leaves prose alone") {
    val df = Seq(
      "write to First.Last+x@sub.domain.org today",
      "card 4111111111111111 and pin 1234",
      "no pii at all"
    ).toDF("t")
    val got = df.select(TF.redactPii($"t")).as[String].collect().toSeq
    assert(got == Seq(
      "write to <EMAIL> today",
      "card <NUM> and pin 1234", // 4-digit pin is below the 7+ threshold
      "no pii at all"))
  }

  test("native HyperplaneBuckets ≡ composed literal-plane hyperplaneBucket") {
    import graft.sources.Tables
    val emb = Tables.embeddings(spark, sf())
    val (nBits, nTables, dim) = (6, 4, 64)
    val nat = emb.select($"vec_id",
        graft.functions.expressions.HyperplaneBuckets($"embedding", nBits, nTables, dim).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    val comp = emb.select($"vec_id",
        array((0 until nTables).map(t =>
          VF.hyperplaneBucket($"embedding", nBits, t, dim)): _*).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(nat == comp)
  }

  test("q63 differential at sf0.01: LSH near-dup docs ≡ exact all-pairs tier") {
    import graft.ops.TextEmbed
    import graft.sources.Tables
    val corpus = Tables.documents(spark, sf("0.01"))
    val exact = TextEmbed.cosineNearDupDocsExact(corpus, "doc_id", "text",
        dim = 64, threshold = 0.95)
      .as[(Long, Long, Double)].collect().toSet
    graft.util.Caches.releaseAll()
    val lsh = TextEmbed.cosineNearDupDocs(corpus, "doc_id", "text",
        dim = 64, threshold = 0.95)
      .as[(Long, Long, Double)].collect().toSet
    graft.util.Caches.releaseAll()
    assert(lsh.subsetOf(exact), "LSH must not invent or rescore pairs")
    assert(lsh == exact,
      s"recall must be 1 on this corpus at these knobs; missing ${exact.diff(lsh)}")
  }
}
