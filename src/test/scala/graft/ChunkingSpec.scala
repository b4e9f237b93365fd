package graft

import org.apache.spark.sql.functions._
import graft.ops.{Boilerplate, Chunker, Decontaminate, Sampling, SetSimJoin}

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("chunk: stride tiling covers every token, last chunk may be short") {
    // 10 tokens, chunkSize 4, stride 3 → starts 0,3,6 (6+4=10 reaches end)
    val d = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val rows = Chunker.chunk(d, "doc_id", "text", chunkSize = 4, stride = 3)
      .select("chunk_ix", "chunk_start", "n_chunk_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L)))

    // 11 tokens → starts 0,3,6,9; last chunk holds 2 tokens
    val d2 = Seq((1L, (1 to 11).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val rows2 = Chunker.chunk(d2, "doc_id", "text", chunkSize = 4, stride = 3)
      .select("chunk_ix", "n_chunk_tokens").as[(Long, Long)].collect().sortBy(_._1)
    assert(rows2.toSeq == Seq((0L, 4L), (1L, 4L), (2L, 4L), (3L, 2L)))
  }

  test("chunk: short and empty docs") {
    val d = Seq((1L, "only three tokens"), (2L, "   "), (3L, "x")).toDF("doc_id", "text")
    val rows = Chunker.chunk(d, "doc_id", "text", chunkSize = 8, stride = 8)
      .select("doc_id", "n_chunk_tokens").as[(Long, Long)].collect().toSet
    // blank doc emits nothing; short docs emit exactly one short chunk
    assert(rows == Set((1L, 3L), (3L, 1L)))
  }

  test("chunk: md5 digests identify identical windows across docs") {
    val d = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c z")).toDF("doc_id", "text")
    val got = Chunker.chunk(d, "doc_id", "text", chunkSize = 4, stride = 4)
      .select("doc_id", "chunk_md5").as[(Long, String)].collect().toMap
    assert(got(1L) == got(2L) && got(1L) != got(3L))
  }

  test("decontaminate: planted overlap is counted, clean docs score zero") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox sat still"), // shares "the quick brown", "quick brown fox"
      (2L, "entirely unrelated words in this document here")
    ).toDF("doc_id", "text")
    val got = Decontaminate.overlapStats(corpus, bench, "doc_id", "text", shingleN = 3)
      .select("doc_id", "n_shingles", "n_hit").as[(Long, Long, Long)].collect()
      .map { case (id, ns, nh) => id -> ((ns, nh)) }.toMap
    assert(got(1L) == ((4L, 2L)))  // 6 tokens → 4 shingles, 2 contaminated
    assert(got(2L)._2 == 0L)
  }

  test("stratifiedSample: nested membership, per-stratum fractions, stable") {
    val half = Sampling.stratifiedSample(docs, $"doc_id", $"lang",
      Map("en" -> 0.5), default = 0.2).select("doc_id").as[Long].collect().toSet
    val quarter = Sampling.stratifiedSample(docs.repartition(7), $"doc_id", $"lang",
      Map("en" -> 0.25), default = 0.1).select("doc_id").as[Long].collect().toSet
    // same bucket function ⇒ the lower-fraction sample nests inside the higher
    assert(quarter.subsetOf(half))
    val en = docs.filter($"lang" === "en").count().toDouble
    val enKept = Sampling.stratifiedSample(docs, $"doc_id", $"lang",
      Map("en" -> 0.5), default = 0.0).count().toDouble
    assert(enKept / en > 0.3 && enKept / en < 0.7, s"en fraction ${enKept / en}")
  }

  test("jaccardPairsAgainst ≡ self-join pairs restricted to cross-parity") {
    val newDocs = docs.filter($"doc_id" % 2 === 1)
    val oldDocs = docs.filter($"doc_id" % 2 === 0)
    val cross = SetSimJoin.jaccardPairsAgainst(newDocs, oldDocs, "doc_id", "text",
        shingleN = 3, threshold = 0.2)
      .select("new_id", "old_id").as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val self = SetSimJoin.jaccardPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .filter { case (a, b) => (a % 2) != (b % 2) }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    assert(cross == self)
  }

  test("containmentPairs: a quote inside a long doc scores ~1 where Jaccard vanishes (r15)") {
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val quote = (10 to 20).map(i => s"w$i").mkString(" ") // 11 tokens ⊂ long
    val corpus = Seq((1L, long), (2L, quote),
      (3L, "totally different words only here now forever and ever again"))
      .toDF("doc_id", "text")
    val cont = SetSimJoin.containmentPairs(corpus, "doc_id", "text",
        shingleN = 3, threshold = 0.9)
      .select("contained_id", "container_id").as[(Long, Long)]
      .collect().toSet
    // quote's 9 trigrams all occur in long → containment 1.0, one DIRECTION
    assert(cont == Set((2L, 1L)))
    // symmetric Jaccard at the same bar misses it (union is the long doc)
    assert(SetSimJoin.jaccardPairs(corpus, "doc_id", "text",
      shingleN = 3, threshold = 0.9).count() == 0L)
    // brute-force differential over the real corpus slice
    val sl = docs.limit(120)
    val got = SetSimJoin.containmentPairs(sl, "doc_id", "text",
        shingleN = 3, threshold = 0.3)
      .select("contained_id", "container_id", "containment")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    val sh = sl.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        val toks = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        id -> toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.toMap
    val want = (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq
      if a != b && sa.nonEmpty
      c = sa.intersect(sb).size.toDouble / sa.size
      if c >= 0.3
    } yield (a, b) -> c).toMap
    assert(got == want)
  }

  test("containmentPairs dfCap: denominator is the KEPT shingle universe " +
      "— a quote wrapped in boilerplate survives the cap (r15)") {
    // every doc carries the same hot boilerplate prefix; doc 2 is that
    // prefix + a verbatim quote from doc 1. With dfCap engaged the
    // boilerplate shingles drop from the index; dividing by the FULL
    // shingle count would report |quote∩doc1| / |boiler+quote| ≈ 0.48
    // and the true containment pair would vanish at threshold 0.8 — the
    // kept-universe denominator keeps it at 11/13 (the quote trigrams
    // plus the two boundary trigrams only doc 2 has; ADVICE r14).
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ")
    val quote = (10 to 22).map(i => s"w$i").mkString(" ")
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val filler = (1 to 30).map { id =>
      (100L + id, s"$boiler only filler${id}a filler${id}b filler${id}c")
    }
    val corpus = (Seq((1L, long), (2L, s"$boiler $quote")) ++ filler)
      .toDF("doc_id", "text")
    val capped = SetSimJoin.containmentPairs(corpus, "doc_id", "text",
        shingleN = 3, threshold = 0.8, dfCap = Some(10L))
      .select("contained_id", "container_id", "containment")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    // brute-force over the SAME capped universe: drop shingles with
    // df > 10, then exact directed containment on what is kept
    val sh = corpus.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        val toks = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        id -> toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.toMap
    val df = sh.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val keptSh = sh.view.mapValues(_.filter(df(_) <= 10)).toMap
    val want = (for {
      (a, sa) <- keptSh.toSeq; (b, sb) <- keptSh.toSeq
      if a != b && sa.nonEmpty
      c = sa.intersect(sb).size.toDouble / sa.size
      if c >= 0.8
    } yield (a, b) -> c).toMap
    assert(capped == want, s"got $capped want $want")
    // the motivating pair is present at the kept-universe score
    assert(capped.get((2L, 1L)).exists(c => math.abs(c - 11.0 / 13.0) < 1e-12),
      s"quote-in-boilerplate pair must survive the cap: $capped")
    // and WITHOUT the resize the full-size denominator would have sunk
    // it below the threshold
    assert(keptSh(2L).intersect(sh(1L)).size.toDouble / sh(2L).size < 0.8)
    graft.util.Caches.releaseAll()
  }

  test("stripBoilerplate removes hot lines everywhere, keeps order, blanks, empty docs") {
    val corpus = Seq(
      (1L, "unique a\nFOOTER\nunique b"),
      (2L, "FOOTER\nunique c"),
      (3L, "unique d\nFOOTER"),
      (4L, "FOOTER"),        // all-boilerplate → empty text, row kept
      (5L, "x\n\ny")         // blank lines are structure, never stripped
    ).toDF("doc_id", "text")
    val out = Boilerplate.stripBoilerplate(corpus, "doc_id", "text", dfCap = 2L)
      .select("doc_id", "text_clean").as[(Long, String)].collect().toMap
    assert(out(1L) == "unique a\nunique b")
    assert(out(2L) == "unique c")
    assert(out(3L) == "unique d")
    assert(out(4L) == "")
    assert(out(5L) == "x\n\ny")
    assert(out.size == 5)
  }

  test("keptIncrement keeps exactly the unmatched new docs, including unshingleable ones") {
    val oldD = Seq((0L, "aaa bbb ccc ddd eee")).toDF("doc_id", "text")
    val newD = Seq(
      (1L, "aaa bbb ccc ddd eee"), // exact dup → dropped
      (3L, "zzz yyy xxx www vvv"), // no overlap → kept
      (5L, "hi")                   // too short to shingle → kept (can't match)
    ).toDF("doc_id", "text")
    val kept = SetSimJoin.keptIncrement(newD, oldD, "doc_id", "text",
        shingleN = 3, threshold = 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 5L))
  }

  test("jaccardPairsAgainst: dfCap drops only capped-shingle-dependent pairs") {
    // every doc opens with the hot trigram "aaa bbb ccc" (old-side df = 4 >
    // cap); each doc's second shingle "bbb ccc xN" is unique to it
    val oldD = Seq(0L, 2L, 4L, 6L).map(i => (i, s"aaa bbb ccc x$i"))
      .toDF("doc_id", "text")
    val newD = Seq(
      (11L, "aaa bbb ccc x0"),  // true dup of old 0
      (13L, "aaa bbb ccc y13")  // overlaps old docs ONLY via the hot shingle
    ).toDF("doc_id", "text")
    def pairs(cap: Option[Long]) =
      SetSimJoin.jaccardPairsAgainst(newD, oldD, "doc_id", "text",
          shingleN = 3, threshold = 0.3, dfCap = cap)
        .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    // uncapped: every (new, old) pair shares the hot shingle → j = 1/3 ≥ 0.3
    assert(pairs(None) ==
      (for (n <- Seq(11L, 13L); o <- Seq(0L, 2L, 4L, 6L)) yield (n, o)).toSet)
    // capped: only the dup pair survives, via its unique sub-cap shingle;
    // hot-only pairs vanish — the conservative direction (never inflates j)
    assert(pairs(Some(3L)) == Set((11L, 0L)))
  }
}
