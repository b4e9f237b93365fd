package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for document pipelines (north-star [EXT]
  * surface; the reference has no text ops — its only string work is a rename
  * and a weekday format, /root/reference/transformation.py:58,74).
  *
  * Everything here is pure Catalyst (`split`, `regexp_extract_all`,
  * higher-order array functions) — codegen-friendly, no UDFs, so the hot path
  * stays inside WholeStageCodegen at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokenization of trimmed, lowercased text.
    * Empty text yields a single empty token (parity with DuckDB
    * string_split_regex); use [[tokenCount]] for a 0-aware count.
    */
  def tokens(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** The character class of UNSEGMENTED scripts — writing systems with no
    * whitespace word boundaries: CJK Unified Ideographs (+ext A), kana,
    * and precomposed hangul. BMP-only on purpose: Spark's `regexp_replace`
    * runs Java regex over UTF-16, where a supplementary character is two
    * code units, so a lone `\\uD840`-style range member would corrupt the
    * class; the BMP blocks cover the scripts that actually lack spacing.
    */
  private[graft] val UnsegmentedScriptClass =
    "[\\u3040-\\u30ff\\u3400-\\u4dbf\\u4e00-\\u9fff\\uac00-\\ud7a3]"

  /** [[tokens]] with the char-level fallback for unsegmented scripts:
    * every CJK/kana/hangul character becomes its OWN token (spaces are
    * injected around each before the whitespace split — BERT's WordPiece
    * normalization). Whitespace-segmented text tokenizes exactly as
    * [[tokens]]; an unsegmented run stops being one giant
    * vocabulary-exploding "word" and degrades to the honest char-level
    * baseline instead (each char one token — fertility and token budgets
    * become meaningful, and BPE's word-frequency table stays bounded by
    * the charset, not the sentence space).
    */
  def tokensCjkSplit(c: Column): Column =
    split(trim(regexp_replace(lower(c),
      s"($UnsegmentedScriptClass)", " $1 ")), "\\s+")

  /** Which of `patterns` occur in the text (distinct, declaration
    * order) — one Aho–Corasick pass whatever the list size
    * ([[graft.functions.expressions.MultiContains]]); the blocklist /
    * PII-marker / contamination-probe screen.
    */
  def blocklistHits(text: Column, patterns: Seq[String]): Column =
    graft.functions.expressions.MultiContains(text, patterns)

  /** Whitespace token count; 0 for blank text. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(tokens(c)))

  /** BPE-ish subword count: runs of letters, runs of digits, or single other
    * non-space chars — a cheap, deterministic proxy for tokenizer cost.
    */
  def bpeishCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Word n-gram shingles over the token array (distinct).
    *
    * Built as zip_with over shifted slices rather than
    * `transform(sequence(...), i => element_at(toks, i+k))`: a lambda-external
    * expression like `element_at(toks, …)` is re-evaluated on EVERY lambda
    * invocation, so the transform formulation re-tokenizes the document once
    * per shingle position (measured 3 ms/doc — 15 s for 5k docs). zip_with
    * evaluates its array arguments exactly once. Spark's zip_with pads the
    * shorter side with nulls, making trailing windows null — `array_compact`
    * drops them, which also yields [] for docs with fewer than n tokens.
    */
  def shingles(toks: Column, n: Int): Column = {
    val joined = (1 until n).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), greatest(size(toks) - k, lit(0))),
        (x, y) => concat(x, lit(" "), y))
    }
    array_distinct(array_compact(joined))
  }

  /** Word n-gram sequence over the token array, NON-distinct (every
    * occurrence kept, in document order) — the building block for
    * repetition metrics, unlike [[shingles]] which dedups for set
    * similarity. Same zip_with-over-shifted-slices shape (see [[shingles]]
    * for why not transform+element_at); [] when fewer than n tokens.
    */
  def ngrams(toks: Column, n: Int): Column = {
    val joined = (1 until n).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), greatest(size(toks) - k, lit(0))),
        (x, y) => concat(x, lit(" "), y))
    }
    array_compact(joined)
  }

  /** Fraction of n-gram occurrences that repeat an earlier occurrence — the
    * Gopher-style duplicate-n-gram boilerplate signal; 0 with fewer than n
    * tokens.
    */
  def dupNgramFraction(toks: Column, n: Int): Column = {
    val g = ngrams(toks, n)
    when(size(g) === 0, lit(0.0))
      .otherwise((size(g) - size(array_distinct(g))).cast("double") / size(g))
  }

  /** Fraction of non-blank lines that duplicate an earlier line (template /
    * boilerplate detector); 0 for blank documents.
    */
  def dupLineFraction(text: Column): Column = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)
    when(size(lines) === 0, lit(0.0))
      .otherwise((size(lines) - size(array_distinct(lines))).cast("double") / size(lines))
  }

  /** Deterministic PII scrub: email-like tokens → `<EMAIL>`, standalone
    * digit runs of 7+ → `<NUM>`. Both patterns are ASCII-class regexes that
    * parse identically under Java regex (Spark) and RE2 (common engines) —
    * the cheap first scrub pass of a corpus pipeline, not a compliance tool.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c,
        lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("<EMAIL>")),
      lit("\\b\\d{7,}\\b"), lit("<NUM>"))

  /** Count of tokens that appear in a fixed marker set. */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers: _*)))

  /** Ratio of stopword tokens to all tokens; 0 for empty docs. */
  def stopwordRatio(toks: Column, stopwords: Seq[String]): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(markerHits(toks, stopwords).cast("double") / size(toks))

  /** Mean token length (characters), 0 for empty docs. */
  def avgTokenLen(toks: Column): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))

  /** Deterministic rolling-hash document fingerprint: polynomial fold of
    * per-token xxhash64 values, mod a large prime. Order-sensitive (a
    * permutation of tokens changes the print) — standard Rabin-Karp shape.
    * Modular arithmetic keeps every intermediate < 1e15, so it is safe under
    * ANSI mode (Spark 4 default) where long overflow throws.
    */
  def fingerprint(toks: Column): Column = {
    val p = lit(1000000007L)
    aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * lit(1000003L) + pmod(xxhash64(t), p), p))
  }

  /** The modulus every portable-hash operator folds under (a common
    * 30-bit prime): small enough that affine maps `a*h+b` with `a,b < P`
    * stay below 2^63 (ANSI-safe), large enough for dedup-grade collision
    * odds at corpus scale.
    */
  val PolyP = 1000000007L

  /** PORTABLE polynomial string hash: fold `h*31 + codepoint (mod P)` over
    * the characters. Bit-identical in any engine with a fold primitive —
    * DuckDB computes the same value as
    * `list_reduce(list_prepend(0, list_transform(string_split(s, ''),
    * c -> ascii(c))), (h, c) -> (h * 31 + c) % 1000000007)` — which makes
    * every hash-DERIVED operator built on it (fingerprints, minhash
    * signatures, simhash prints, hashing-trick embeddings) replayable by
    * the external oracle. The xxhash64 variants remain the production
    * tier (one hash call vs a per-char fold, 64 bits vs ~30); the
    * portable tier is the verification face of the same algebra.
    */
  def polyHash(c: Column): Column =
    aggregate(split(c, ""), lit(0L),
      (h, ch) => pmod(h * lit(31L) + ascii(ch), lit(PolyP)))

  /** [[fingerprint]] over [[polyHash]] token values — same Rabin-Karp
    * fold, oracle-replayable (see [[polyHash]]). Intermediates < 1e16.
    */
  def fingerprintPortable(toks: Column): Column = {
    val p = lit(PolyP)
    aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * lit(1000003L) + polyHash(t), p))
  }

  /** Heuristic language ID over marker-token hit counts. Deterministic
    * tie-break: first language in `markers` order wins ties.
    */
  def langId(toks: Column, markers: Seq[(String, Seq[String])]): Column = {
    val scored = markers.map { case (lang, ws) => (lang, markerHits(toks, ws)) }
    // argmax via chained when: lang_i wins if its score > all earlier and >= all later
    scored.zipWithIndex.foldLeft(lit("und")) { case (acc, ((lang, s), i)) =>
      val beatsEarlier = scored.take(i).map(_._2 < s)
      val tiesLater    = scored.drop(i + 1).map(_._2 <= s)
      val cond = (beatsEarlier ++ tiesLater ++ Seq(s > 0)).reduce(_ && _)
      when(cond, lit(lang)).otherwise(acc)
    }
  }
}
