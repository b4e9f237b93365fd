package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** BPE merge-table training + application: hand-computed merge sequences
  * on a known corpus, the greedy non-overlapping pass on repeated
  * symbols (the window-run algebra), order-sensitivity of application,
  * and the versioned-artifact roundtrip.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges learns the hand-computed merge sequence, with ties " +
      "broken (count DESC, lhs, rhs)") {
    // corpus: "low low low lower newest" — pair counts round 1:
    // (l,o) 4, (o,w) 4, (w,e) 2, … tie (l,o)/(o,w) at 4 → lhs asc picks (l,o)
    val docs = Seq((1L, "low low low lower newest"))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", rounds = 3)
      .orderBy("round").collect()
    assert(merges.length == 3)
    assert(merges(0).getString(1) == "l" && merges(0).getString(2) == "o" &&
      merges(0).getLong(4) == 4L,
      s"round 1 expected (l, o, 4), got ${merges(0)}")
    // after (l,o): lo|w ×4 → (lo,w) 4 is now the top pair
    assert(merges(1).getString(1) == "lo" && merges(1).getString(2) == "w",
      s"round 2 expected (lo, w), got ${merges(1)}")
    // after (lo,w): low ×3, low|er, n|e|w|e|s|t → best pair count 2:
    // candidates (e,r)? no ×1; (e,s) ×1 … (w,e) in newest ×1, lower has
    // low|e|r → (low,e) ×1, (e,r) ×1; newest: (n,e)(e,w)(w,e)(e,s)(s,t)
    // all ×1 — EVERY pair counts 1 → tie broken by lhs asc, rhs asc:
    // candidates sorted: (e,r),(e,s),(e,w),(low,e),(n,e),(s,t),(w,e)
    assert(merges(2).getString(1) == "e" && merges(2).getString(2) == "r",
      s"round 3 expected the (e, r) tie-break, got ${merges(2)}")
  }

  test("applyMerge is the greedy LEFT-TO-RIGHT non-overlapping pass: " +
      "aaaa→[aa,aa], aaa→[aa,a], and interleaved matches stay correct") {
    val seg = Seq(
      ("aaaa", 1L), ("aaa", 1L), ("abab", 1L), ("aab", 1L))
      .toDF("word", "freq")
      .withColumn("syms", Bpe.charSyms(col("word")))
    val out = Bpe.applyMerge(seg, Seq("word"), "a", "a")
      .select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(out("aaaa") == List("aa", "aa"), out("aaaa").toString)
    assert(out("aaa") == List("aa", "a"), out("aaa").toString)
    assert(out("abab") == List("a", "b", "a", "b"))
    assert(out("aab") == List("aa", "b"))
    val ab = Bpe.applyMerge(seg, Seq("word"), "a", "b")
      .select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(ab("abab") == List("ab", "ab"))
    assert(ab("aab") == List("a", "ab"))
    assert(ab("aaaa") == List("a", "a", "a", "a"))
  }

  test("segmentWords replays merges IN ORDER (a later merge can consume " +
      "an earlier merge's output), and bpeTokenCounts sums per doc") {
    val words = Seq(("lower", 0L)).toDF("word", "freq")
    val segd = Bpe.segmentWords(words, "word",
      Seq(("l", "o"), ("lo", "w"), ("low", "e")))
      .select("syms").head().getSeq[String](0).toList
    assert(segd == List("lowe", "r"), segd.toString)
    val docs = Seq((1L, "low low"), (2L, "lower")).toDF("doc_id", "text")
    val counts = Bpe.bpeTokenCounts(docs, "doc_id", "text",
        Seq(("l", "o"), ("lo", "w")))
      .orderBy("doc_id").collect()
    // doc 1: 2 whitespace tokens, each "low" → 1 symbol = 2 BPE tokens
    assert(counts(0).getLong(1) == 2L && counts(0).getLong(2) == 2L)
    // doc 2: "lower" → low|e|r = 3 BPE tokens
    assert(counts(1).getLong(1) == 1L && counts(1).getLong(2) == 3L)
  }

  test("end-of-word marker: '</w>' is a round-0 symbol, word-final " +
      "merges become distinct vocabulary, and the learned table diverges " +
      "from the unmarked one") {
    // "low low lower": unmarked round 1 learns (l,o) ×3; marked corpus
    // has pairs (l,o)×3, (o,w)×3, (w,</w>)×2, (w,e)… — (l,o) still wins,
    // but the marker ends up mergeable: after (l,o),(lo,w) the pair
    // (low,</w>) ×2 exists ONLY in eow mode
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val plain = Bpe.trainMerges(docs, "text", rounds = 4).collect()
      .map(_.getString(3)).toSet
    val marked = Bpe.trainMerges(docs, "text", rounds = 4, eow = true)
      .collect().map(_.getString(3)).toSet
    assert(marked.exists(_.endsWith(Bpe.EowMarker)),
      s"no word-final merge learned: $marked")
    assert(!plain.exists(_.contains(Bpe.EowMarker)))
    // segmentation under the marked table keeps the marker attached to
    // the final subword — the detokenization property
    val seg = Bpe.segmentWords(Seq(("low", 1L)).toDF("word", "freq"),
      "word", Seq(("l", "o"), ("lo", "w"), ("low", Bpe.EowMarker)),
      eow = true).select("syms").head().getSeq[String](0).toList
    assert(seg == List("low" + Bpe.EowMarker), seg.toString)
  }

  test("detokenize inverts eow segmentation: segment → detokenize " +
      "reconstructs the word sequence exactly") {
    val docs = Seq((1L, "low lower newest")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", rounds = 5, eow = true)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // segment the doc's words in order, concatenate all tokens with the
    // markers intact, detokenize → the original lowercased text
    val toks = docs.select(explode(
        graft.functions.TextFunctions.tokens(col("text"))).as("word"))
      .withColumn("ord", monotonically_increasing_id())
    val seg = Bpe.segmentWords(toks.select("word").distinct(), "word",
      merges, eow = true)
    val stream = toks.join(seg, "word").orderBy("ord")
      .agg(flatten(collect_list(col("syms"))).as("tokens"))
    val back = stream.select(Bpe.detokenize(col("tokens")).as("t"))
      .head().getString(0)
    assert(back == "low lower newest", s"roundtrip broke: '$back'")
  }

  test("publishMerges → loadMerges roundtrips in training order, and a " +
      "retrain is the next version (readCurrent serves it)") {
    val docs = Seq((1L, "low low low lower newest")).toDF("doc_id", "text")
    val root = graft.util.TempRoots.create("graft_bpespec") + "/merges"
    val trained = Bpe.trainMerges(docs, "text", rounds = 3)
    Bpe.publishMerges(spark, root, trained)
    val back = Bpe.loadMerges(spark, root)
    assert(back == Seq(("l", "o"), ("lo", "w"), ("e", "r")), back.toString)
    // retrain with more rounds → v1 serves 4 merges, v0 stays at 3
    Bpe.publishMerges(spark, root,
      Bpe.trainMerges(docs, "text", rounds = 4))
    assert(Bpe.loadMerges(spark, root).length == 4)
    assert(graft.sources.Layout.readVersion(spark, root, 0).count() == 3L)
  }

  test("fertility: per-group BPE-tokens-per-word of a FROZEN tokenizer — " +
      "seen vocabulary merges, unseen vocabulary stays char-fragmented") {
    // tokenizer knows "low" (fully merged); group b's "cat" is OOV and
    // segments to 3 chars per word
    val docs = Seq(
      (1L, "low low", "a"), (2L, "low", "a"), (3L, "cat cat", "b"))
      .toDF("doc_id", "text", "lang")
    val out = graft.ops.Bpe.fertility(docs, "doc_id", "text", "lang",
        Seq(("l", "o"), ("lo", "w")))
      .orderBy("lang").collect()
    // a: 3 words → 3 BPE tokens → fertility 1.0
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 3L &&
      out(0).getLong(3) == 1000000L, out(0).toString)
    // b: 2 words → 6 BPE tokens → fertility 3.0
    assert(out(1).getLong(1) == 2L && out(1).getLong(2) == 6L &&
      out(1).getLong(3) == 3000000L, out(1).toString)
  }

  test("trainMerges stops early when no pair remains (single-char words " +
      "never mint a merge), returning the rounds it could learn") {
    val docs = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", rounds = 5).collect()
    assert(merges.isEmpty,
      s"single-char vocabulary has no pairs, got ${merges.mkString}")
    val two = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val m2 = Bpe.trainMerges(two, "text", rounds = 5)
      .orderBy("round").collect()
    // round 1: (a,b)×2; round 2: (c,d)×1; then dry
    assert(m2.length == 2 && m2(0).getString(3) == "ab" &&
      m2(1).getString(3) == "cd", m2.mkString("; "))
  }
}
