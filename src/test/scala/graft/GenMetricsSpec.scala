package graft

import org.apache.spark.sql.functions._
import graft.ops.GenMetrics

/** BLEU / ROUGE-N: textbook hand cases, identity pairs, clipping,
  * brevity penalty, NULL conventions, repartition invariance.
  */
class GenMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("bleu: identical texts score 1 everywhere; the clipped 'the the'" +
      " case matches Papineni's p1 = 2/7; short candidates NULL (r16)") {
    val same = Seq((1L, "the quick brown fox jumps over dogs",
      "the quick brown fox jumps over dogs")).toDF("id", "cand", "ref")
    val r = GenMetrics.bleu(same, "id", "cand", "ref").collect().head
    // p1..p4 = 1, bp = 1, bleu = 1
    assert((3 to 8).forall(i => r.getLong(i) == 1000000L), s"$r")
    // the classic clipping example: candidate of seven 'the', reference
    // contains 'the' twice → p1 = 2/7; no bigram matches → bleu NULL
    val clip = Seq((1L, "the the the the the the the",
      "the cat is on the mat")).toDF("id", "cand", "ref")
    val c = GenMetrics.bleu(clip, "id", "cand", "ref").collect().head
    assert(c.getLong(3) == math.floor(2.0 / 7.0 * 1e6 + 0.5).toLong)
    // p2 is 0 (bigrams exist, none match — a defined zero), so BLEU is
    // NULL through the zero-precision guard, not through a missing order
    assert(c.getLong(4) == 0L && c.isNullAt(8), s"$c")
    // candidate shorter than the reference: bp = exp(1 − r/c) < 1
    val short = Seq((1L, "the quick brown fox",
      "the quick brown fox jumps over dogs")).toDF("id", "cand", "ref")
    val s = GenMetrics.bleu(short, "id", "cand", "ref").collect().head
    assert(s.getLong(7) ==
      math.floor(math.exp(1.0 - 7.0 / 4.0) * 1e6 + 0.5).toLong)
  }

  test("rougeN: hand case recall/precision/F1; no-overlap zero; " +
      "too-short sides NULL; repartition invariance (r16)") {
    // cand bigrams {ab, bc, cd}; ref bigrams {ab, bx, xd} → match 1
    val df = Seq((1L, "a b c d", "a b x d")).toDF("id", "cand", "ref")
    val r = GenMetrics.rougeN(df, "id", "cand", "ref", n = 2)
      .collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) == 3L && r.getLong(3) == 3L)
    val third = math.floor(1.0 / 3.0 * 1e6 + 0.5).toLong
    assert(r.getLong(4) == third && r.getLong(5) == third &&
      r.getLong(6) == third)
    val none = Seq((1L, "a b", "x y")).toDF("id", "cand", "ref")
    val z = GenMetrics.rougeN(none, "id", "cand", "ref", n = 2)
      .collect().head
    assert(z.getLong(4) == 0L && z.getLong(5) == 0L && z.isNullAt(6))
    // a one-token side has no bigrams → NULL on that side's ratio
    val shortSide = Seq((1L, "a", "a b c")).toDF("id", "cand", "ref")
    val ss = GenMetrics.rougeN(shortSide, "id", "cand", "ref", n = 2)
      .collect().head
    assert(ss.isNullAt(5) && ss.getLong(4) == 0L)
    // invariance on a synthetic slice
    val rnd = new scala.util.Random(3)
    val corpus = Seq.tabulate(50)(i =>
      (i.toLong, Seq.fill(20)(s"w${rnd.nextInt(30)}").mkString(" "),
        Seq.fill(20)(s"w${rnd.nextInt(30)}").mkString(" ")))
      .toDF("id", "cand", "ref")
    val a = GenMetrics.rougeN(corpus, "id", "cand", "ref", 2)
      .collect().toSet
    val b = GenMetrics.rougeN(corpus.repartition(7), "id", "cand", "ref", 2)
      .collect().toSet
    assert(a == b)
    val c = GenMetrics.bleu(corpus, "id", "cand", "ref").collect().toSet
    val d = GenMetrics.bleu(corpus.repartition(5), "id", "cand", "ref")
      .collect().toSet
    assert(c == d)
    graft.util.Caches.releaseAll()
  }

  test("chrF: identity = 1; hand case replicates the nano-mean arithmetic; " +
      "whitespace removal; both-empty NULL (r16)") {
    val same = Seq((1L, "ab cd", "abcd")).toDF("id", "cand", "ref")
    // whitespace ignored: "ab cd" and "abcd" are the same char stream
    val r = GenMetrics.chrF(same, "id", "cand", "ref").collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 1000000L && r.getLong(4) == 1000000L &&
      r.getLong(5) == 1000000L, s"$r")
    // hand case: cand "ab", ref "abc" — P̄ over orders {1, 2} = 1;
    // R̄ over orders {1, 2, 3} = (2/3 + 1/2 + 0)/3, same nano floors
    val h = GenMetrics.chrF(Seq((1L, "ab", "abc")).toDF("id", "cand", "ref"),
      "id", "cand", "ref").collect().head
    val rbarNano = (math.floor(2.0 / 3.0 * 1e9 + 0.5).toLong +
      math.floor(0.5 * 1e9 + 0.5).toLong) // order-3 term is 0
    val rbar = rbarNano.toDouble / 1e9 / 3.0
    val f = 5.0 * 1.0 * rbar / (4.0 * 1.0 + rbar)
    assert(h.getLong(3) == 1000000L)
    assert(h.getLong(4) == math.floor(rbar * 1e6 + 0.5).toLong)
    assert(h.getLong(5) == math.floor(f * 1e6 + 0.5).toLong, s"$h")
    // an empty-after-whitespace pair: no grams either side -> NULLs
    val e = GenMetrics.chrF(Seq((1L, "   ", " ")).toDF("id", "cand", "ref"),
      "id", "cand", "ref").collect().head
    assert(e.isNullAt(3) && e.isNullAt(4) && e.isNullAt(5))
    graft.util.Caches.releaseAll()
  }
}
