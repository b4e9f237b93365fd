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

  test("trainMergesLocal ≡ trainMerges: identical merge tables, plain " +
      "and eow (including a marker-bearing word), and early-stop parity") {
    val docs = Seq(
      (1L, "low low low lower lowest newest new news"),
      (2L, "the newest news is the lowest low"),
      (3L, "wider wide widest low lower"),
      (4L, "markup</w>text low")).toDF("doc_id", "text")
    for (eow <- Seq(false, true)) {
      val dist = Bpe.trainMerges(docs, "text", rounds = 10, eow = eow)
        .orderBy("round").collect().map(_.toSeq).toSeq
      val local = Bpe.trainMergesLocal(docs, "text", rounds = 10,
          eow = eow)
        .orderBy("round").collect().map(_.toSeq).toSeq
      assert(local == dist,
        s"eow=$eow diverged:\nlocal = $local\ndist  = $dist")
      assert(local.length == 10)
    }
    val tiny = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val d2 = Bpe.trainMerges(tiny, "text", rounds = 6)
      .orderBy("round").collect().map(_.toSeq).toSeq
    val l2 = Bpe.trainMergesLocal(tiny, "text", rounds = 6)
      .orderBy("round").collect().map(_.toSeq).toSeq
    assert(l2 == d2 && l2.length == 2, s"early-stop parity broke: $l2")
  }

  test("trainMergesLocal drains the sf0.001 corpus to a fully-merged " +
      "vocabulary in one call and its prefix matches the distributed " +
      "trainer") {
    val docs = graft.sources.Tables.documents(spark, sf())
    // ask for far more rounds than the vocabulary can mint: the trainer
    // must return EVERY learnable merge (each word one symbol at the
    // end) and stop — the budget a 6-round job loop could never drain
    val local = graft.ops.Bpe.trainMergesLocal(docs, "text", rounds = 2000)
      .orderBy("round").collect()
    assert(local.length >= 80 && local.length < 2000,
      s"expected a drained vocabulary (≥80, <2000), got ${local.length}")
    // the sequential algorithm's first k merges are invariant to the
    // total round budget, so the 6-round distributed table must be the
    // exact prefix
    val dist6 = Bpe.trainMerges(docs, "text", rounds = 6)
      .orderBy("round").collect().map(_.toSeq).toSeq
    assert(local.take(6).map(_.toSeq).toSeq == dist6)
  }

  test("eow marker collision (ADVICE r17): literal '</w>' substrings " +
      "strip on ingest, so merges can never assemble a fake boundary") {
    val words = Seq(("a</w>b", 1L), ("</w>", 1L), ("plain", 1L))
      .toDF("word", "freq")
    val out = words.select(col("word"),
        Bpe.charSyms(col("word"), eow = true).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    assert(out("a</w>b") == List("a", "b", Bpe.EowMarker), out.toString)
    assert(out("</w>") == List(Bpe.EowMarker), out.toString)
    assert(out("plain") ==
      List("p", "l", "a", "i", "n", Bpe.EowMarker))
    // detokenize sees only TRUE boundary markers: the stream of the
    // stripped words reconstructs "ab" (no spurious split inside it)
    val back = words.filter(col("word") === "a</w>b")
      .select(Bpe.detokenize(Bpe.charSyms(col("word"), eow = true)).as("t"))
      .head().getString(0)
    assert(back == "ab", s"spurious boundary: '$back'")
  }

  test("cjkCharSplit mixed-script: unsegmented runs tokenize per " +
      "character (charset-bounded vocabulary), whitespace text unchanged") {
    val docs = Seq(
      (1L, "hello 世界和平 world"),
      (2L, "世界 again 世界和平")).toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, "text", cjkCharSplit = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc("世") == 3L && wc("界") == 3L && wc("和") == 2L &&
      wc("平") == 2L, wc.toString)
    assert(wc("hello") == 1L && wc("world") == 1L && wc("again") == 1L)
    assert(!wc.contains("世界和平"),
      "the unsegmented run leaked through as one giant word")
    // plain mode keeps the giant word — the failure mode the fallback fixes
    val plain = Bpe.wordCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain.contains("世界和平"))
    // token budgets under a frozen tokenizer: CJK chars count one each
    val counts = Bpe.bpeTokenCounts(docs, "doc_id", "text",
        Seq(("h", "e")), cjkCharSplit = true)
      .orderBy("doc_id").collect()
    // doc 1: hello + 4 chars + world = 6 tokens; he|l|l|o=4, 4×1, 5 → 13
    assert(counts(0).getLong(1) == 6L && counts(0).getLong(2) == 13L,
      counts(0).toString)
    // doc 2: 世,界,again,世,界,和,平 = 7 tokens; 1+1+5+1+1+1+1 = 11
    assert(counts(1).getLong(1) == 7L && counts(1).getLong(2) == 11L,
      counts(1).toString)
    // trainers agree on the mode too
    val dist = Bpe.trainMerges(docs, "text", rounds = 2,
      cjkCharSplit = true).orderBy("round").collect().map(_.toSeq).toSeq
    val local = Bpe.trainMergesLocal(docs, "text", rounds = 2,
      cjkCharSplit = true).orderBy("round").collect().map(_.toSeq).toSeq
    assert(dist == local && dist.nonEmpty)
  }

  test("vocabOf + encodeIds: dense code-point-ordered ids, the doc's " +
      "ordered id stream, and the publishVocab roundtrip") {
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"))
    val segd = Bpe.segmentWords(
      Seq(("low", 0L), ("lower", 0L)).toDF("word", "freq"), "word", merges)
    // symbols: low→[low], lower→[low,e,r] → distinct {e, low, r} →
    // e=0, low=1, r=2 (binary string order)
    val vocab = Bpe.vocabOf(segd).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab == Map("e" -> 0L, "low" -> 1L, "r" -> 2L), vocab.toString)
    val ids = Bpe.encodeIds(docs, "doc_id", "text", merges)
      .orderBy("pos").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toList
    // "low low lower" → low, low, low|e|r → [1, 1, 1, 0, 2]
    assert(ids == List((0L, 1L), (1L, 1L), (2L, 1L), (3L, 0L), (4L, 2L)),
      ids.toString)
    val root = graft.util.TempRoots.create("graft_bpevocab") + "/vocab"
    Bpe.publishVocab(spark, root, Bpe.vocabOf(segd))
    val back = graft.sources.Layout.readCurrent(spark, root).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(back == vocab)
  }

  test("encodeIdsWith: a FIXED vocabulary ids a new corpus — covered " +
      "symbols keep their published ids, uncovered symbols become UnkId " +
      "(not silently dropped), and oovStats counts them exactly") {
    val train = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"))
    val vocab = Bpe.corpusVocab(train, "text", merges)
    // training vocabulary: {e→0, low→1, r→2}
    // new corpus: "low qat" → low→[low]→1; qat→[q,a,t]→unk,unk,unk —
    // positions 1..3 PRESENT (an inner join would drop them)
    val ids = Bpe.encodeIdsWith(Seq((9L, "low qat")).toDF("doc_id", "text"),
        "doc_id", "text", merges, vocab)
      .orderBy("pos").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toList
    assert(ids == List((0L, 1L), (1L, Bpe.UnkId), (2L, Bpe.UnkId),
      (3L, Bpe.UnkId)), ids.toString)
    val stats = Bpe.oovStats(
      Bpe.encodeIdsWith(Seq((9L, "low qat")).toDF("doc_id", "text"),
        "doc_id", "text", merges, vocab), "doc_id").collect().head
    assert(stats.getAs[Long]("n_ids") == 4L &&
      stats.getAs[Long]("n_oov") == 3L &&
      stats.getAs[Long]("oov_micro") == 750000L, stats.toString)
    // on the training corpus itself the fixed-vocab form is id-for-id
    // the per-call form (zero OOV by construction)
    val fixed = Bpe.encodeIdsWith(train, "doc_id", "text", merges, vocab)
      .orderBy("pos").collect().map(r => (r.getLong(1), r.getLong(2)))
    val percall = Bpe.encodeIds(train, "doc_id", "text", merges)
      .orderBy("pos").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(fixed.sameElements(percall))
  }

  test("vocabCoverage: symbol frequencies are word-count-weighted, rank " +
      "ties break (freq DESC, symbol), and the cumulative share reaches " +
      "exactly 1e6 — hand-computed") {
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"))
    // low×2→[low], lower×1→[low,e,r]: low 3, e 1, r 1; total 5 →
    // rank low(3)=1 cum 600000, e(1)=2 cum 800000, r(1)=3 cum 1000000
    val out = Bpe.vocabCoverage(docs, "text", merges)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    assert(out == List(("low", 3L, 1L, 600000L), ("e", 1L, 2L, 800000L),
      ("r", 1L, 3L, 1000000L)), out.toString)
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

  test("segmentWords' native expression ≡ the charSyms + applyMerge " +
      "window replay, plain and eow, over adversarial words") {
    // covers: repeated-symbol runs (greedy every-other), merges consuming
    // earlier merges' output, multi-code-point (surrogate-pair) chars,
    // marker-bearing words in eow mode, single chars, and a word where no
    // merge fires
    val words = Seq("aaaa", "aaab", "abab", "low", "lower", "lowest",
      "newest", "widest", "x", "ab", "ba", "a" + Bpe.EowMarker + "b",
      "😀a😀", "ababab", "aabb").toDF("word")
    val merges = Seq(("a", "a"), ("a", "b"), ("ab", "ab"), ("l", "o"),
      ("lo", "w"), ("e", "s"), ("es", "t"), ("w", "est"))
    for (eow <- Seq(false, true)) {
      val viaExpr = Bpe.segmentWords(words, "word", merges, eow)
        .select("word", "syms").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      val start = words.withColumn("syms", Bpe.charSyms(col("word"), eow))
      val viaWindows = merges.foldLeft(start) { case (acc, (a, b)) =>
        Bpe.applyMerge(acc, Seq("word"), a, b).localCheckpoint(true)
      }.select("word", "syms").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      assert(viaExpr == viaWindows,
        s"eow=$eow:\nexpr    $viaExpr\nwindows $viaWindows")
    }
  }
}
