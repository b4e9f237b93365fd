package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Byte-pair-encoding merge-table TRAINING and APPLICATION (Sennrich et
  * al., "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016) — the tokenizer-construction half a training-data pipeline
  * runs before any token count, pack or mixture decision is meaningful:
  * learn the `rounds` most frequent adjacent symbol pairs from the
  * corpus, then segment text by replaying those merges in order.
  *
  * SCALE SHAPE — the defining trick is that BPE training never touches
  * the corpus after one tokenize pass: it operates on the WORD-FREQUENCY
  * table (`(word, freq)` — vocabulary-bounded, millions of rows at 100 TB
  * of text, not trillions), so each merge round is a handful of
  * vocab-sized shuffles plus a ONE-ROW argmax collect (bounded driver
  * metadata, the [[Quantize.trainCodebooks]] class). Application is the
  * same per-word replay joined back to the corpus token stream — the
  * corpus pays one explode + one broadcast-ish join per use, never a
  * per-round pass.
  *
  * Everything is deterministic and oracle-replayable: the argmax breaks
  * ties (count DESC, left ASC, right ASC); the greedy left-to-right
  * non-overlapping merge pass is resolved with windows (runs of
  * consecutive match positions — only possible when left == right — take
  * every OTHER position from the run start, exactly the sequential
  * scanner's behavior), so the unrolled-CTE oracle (q220/q229 pattern)
  * computes the identical segmentation.
  */
object Bpe {

  /** `(word, freq)` over the house whitespace tokens — the vocabulary
    * table every training round operates on.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** The end-of-word marker symbol (Sennrich 2016's `</w>`): appended as
    * its own round-0 symbol when `eow = true`, it makes word-FINAL
    * subwords distinct vocabulary entries ("er" inside a word vs "er</w>"
    * ending one), which is what lets a detokenizer reconstruct word
    * boundaries from a flat token stream. A raw word CAN contain the
    * literal marker substring (markup text) — and merges could even
    * assemble a real "</w>" symbol from the adjacent chars '<','/','w','>'
    * (only possible when the word contains the substring) — either way
    * colliding with the boundary marker and breaking detokenize, so
    * [[charSyms]] STRIPS the substring from the input word in eow mode
    * (a documented normalization: the roundtrip is exact for marker-free
    * text; marker substrings drop on ingest).
    */
  val EowMarker = "</w>"

  /** A word's round-0 symbol sequence: its characters, in order; with
    * `eow`, [[EowMarker]] appended as a final symbol — after stripping
    * any literal marker substring from the word (see [[EowMarker]]; a
    * word that was ONLY the marker contributes just the boundary symbol).
    */
  def charSyms(word: Column, eow: Boolean = false): Column =
    if (!eow)
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))
    else {
      val w = regexp_replace(word,
        java.util.regex.Pattern.quote(EowMarker), "")
      // greatest(len, 1) keeps sequence() ascending when the strip left an
      // empty word (sequence(1, 0) would run DESCENDING and fabricate
      // symbols); the lone out-of-range substr yields "" and filters out
      val chars = filter(
        transform(sequence(lit(1), greatest(length(w), lit(1))),
          i => w.substr(i, lit(1))),
        s => s =!= "")
      concat(chars, array(lit(EowMarker)))
    }

  /** ONE greedy left-to-right merge pass of pair (a, b) over `symsCol`,
    * non-overlapping exactly like the sequential BPE scanner: among the
    * match positions of one key, runs of CONSECUTIVE positions (possible
    * only when a == b, e.g. "aaaa") take every other position from the
    * run start; a taken position emits the merged symbol and consumes
    * its right neighbor. Per-key windows only (word- or doc-grain — the
    * bounded-grain class), no corpus-grain state.
    *
    * CONTRACT: `keyCols` must uniquely key the rows — two rows sharing a
    * key would interleave their exploded positions under one window and
    * merge across each other. Every internal caller guarantees it
    * (trainMerges groups by word; bpeTokenCounts segments DISTINCT
    * words); external [[segmentWords]] callers own the same guarantee.
    */
  private[graft] def applyMerge(seg: DataFrame, keyCols: Seq[String],
                                a: String, b: String): DataFrame = {
    val ks = keyCols.map(col)
    val others = seg.columns.filterNot(_ == "syms").map(col).toSeq
    val ex = seg.select(
      others :+ posexplode(col("syms")).as(Seq("__pos", "__sym")): _*)
    val wOrd = Window.partitionBy(ks: _*).orderBy(col("__pos"))
    val m = ex.withColumn("__nxt", lead(col("__sym"), 1).over(wOrd))
    val hits = m.filter(col("__sym") === lit(a) && col("__nxt") === lit(b))
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__grp", col("__pos") - col("__rn"))
    val wGrp = Window.partitionBy(ks :+ col("__grp"): _*)
    val taken = hits
      .withColumn("__start", min(col("__pos")).over(wGrp))
      .filter(((col("__pos") - col("__start")) % 2) === 0)
      .select(ks :+ col("__pos"): _*)
    val tk = taken.withColumn("__tk", lit(true))
    val cons = taken
      .select(ks :+ (col("__pos") + 1).as("__pos"): _*)
      .withColumn("__cons", lit(true))
    m.join(tk, keyCols :+ "__pos", "left")
      .join(cons, keyCols :+ "__pos", "left")
      .filter(col("__cons").isNull)
      .withColumn("__out",
        when(col("__tk"), lit(a + b)).otherwise(col("__sym")))
      .groupBy(others: _*)
      .agg(transform(
        array_sort(collect_list(struct(col("__pos"), col("__out")))),
        s => s.getField("__out")).as("syms"))
  }

  /** Learn `rounds` BPE merges from the corpus: per round, the
    * most-frequent adjacent symbol pair over the word-frequency table
    * (freq-weighted; ties break (count DESC, left ASC, right ASC)) is
    * recorded and applied. Stops early if no pair remains (every word
    * fully merged). The per-round state persists and the previous round
    * unpersists — lineage stays one round deep, the graph-loop
    * discipline.
    *
    * @return (round, left, right, merged, pair_count) — `rounds` rows
    */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int,
                  eow: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(rounds >= 1, "trainMerges: rounds must be ≥ 1")
    // localCheckpoint, NOT persist: applyMerge's plan references its
    // input ~4 times (explode, taken, consumed, rebuild), so an
    // un-truncated LOGICAL plan grows ~4× per round and the OPTIMIZER —
    // not execution — goes exponential (measured 56 s for 6 rounds with
    // persist-only vs ~2 s checkpointed, on a 31-word vocabulary). The
    // checkpoint also cuts the corpus tokenize out of every later round.
    var seg = wordCounts(docs, textCol)
      .withColumn("syms", charSyms(col("word"), eow))
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      val pairs = seg.select(col("freq"),
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("__l"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("__r"))
        .select(col("freq"),
          explode(arrays_zip(col("__l"), col("__r"))).as("__p"))
        .select(col("freq"), col("__p.__l").as("a"), col("__p.__r").as("b"))
      // ONE row to the driver — the argmax is bounded metadata
      val best = pairs.groupBy(col("a"), col("b"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) dry = true
      else {
        val a = best(0).getString(0)
        val b = best(0).getString(1)
        val c = best(0).getLong(2)
        out += ((r.toLong, a, b, a + b, c))
        seg = applyMerge(seg, Seq("word"), a, b).localCheckpoint(true)
        r += 1
      }
    }
    out.toSeq.toDF("round", "lhs", "rhs", "merged", "pair_count")
  }

  /** Segment a word table with an ORDERED merge list: round-0 chars,
    * then each merge replayed in training order — the application half
    * of the tokenizer. `df` keeps its other columns. `wordCol` values
    * must be UNIQUE in `df` ([[applyMerge]]'s keying contract —
    * segment the distinct vocabulary, then join counts back, as
    * [[bpeTokenCounts]] does).
    */
  def segmentWords(df: DataFrame, wordCol: String,
                   merges: Seq[(String, String)],
                   eow: Boolean = false): DataFrame = {
    // per-merge localCheckpoint — the same ~4×-per-merge logical-plan
    // blowup as [[trainMerges]] (a 6-merge uncheckpointed fold measured
    // 36 s of pure optimizer time at sf0.1); eager per-merge jobs are
    // the cost, bounded by the merge-table length over a
    // vocabulary-sized frame
    val start = df.withColumn("syms", charSyms(col(wordCol), eow))
      .localCheckpoint(true)
    merges.foldLeft(start) { case (acc, (a, b)) =>
      applyMerge(acc, Seq(wordCol), a, b).localCheckpoint(true)
    }
  }

  /** BPE token count per document: tokenize, segment the DISTINCT words
    * once (vocabulary-bounded work), join the per-word symbol counts
    * back to the token stream, sum per doc. The corpus is touched by one
    * explode + one join — never by the per-merge replay.
    *
    * @return (idCol, n_tokens, n_bpe_tokens)
    */
  def bpeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                     merges: Seq[(String, String)],
                     eow: Boolean = false): DataFrame = {
    val toks = docs.select(col(idCol), explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
    val perWord = segmentWords(toks.select(col("word")).distinct(),
        "word", merges, eow)
      .select(col("word"), size(col("syms")).cast("long").as("__n"))
    // vocabulary-bounded broadcast keeps the corpus token stream
    // unshuffled; a vocabulary past the executor broadcast budget
    // (hundreds of millions of distinct words) would drop the hint and
    // take the word-partitioned shuffle join instead
    toks.join(broadcast(perWord), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__n")).as("n_bpe_tokens"))
  }

  /** Tokenizer FERTILITY per group (BPE tokens per whitespace word) —
    * the cross-corpus transfer readout: a tokenizer trained on one slice
    * and applied to another shows where it fragments (high fertility =
    * the merge table never saw this group's vocabulary — the budget
    * number a multilingual mixture decision runs on). Composition of
    * [[bpeTokenCounts]] + one group-grain aggregate; the ratio is a
    * micro-floored double of exact longs (engine-stable).
    *
    * @return (groupCol, n_words, n_bpe_tokens, fertility_micro)
    */
  def fertility(docs: DataFrame, idCol: String, textCol: String,
                groupCol: String, merges: Seq[(String, String)]): DataFrame =
    bpeTokenCounts(docs, idCol, textCol, merges)
      .join(docs.select(col(idCol), col(groupCol)), Seq(idCol))
      .groupBy(col(groupCol))
      .agg(sum(col("n_tokens")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
      // n_words ≥ 1 by construction: a doc with no tokens never reaches
      // bpeTokenCounts' inner join, so no ANSI division guard is needed
      .withColumn("fertility_micro",
        floor(col("n_bpe_tokens").cast("double") /
          col("n_words").cast("double") * lit(1e6) + lit(0.5)).cast("long"))

  /** Detokenize an eow-marked BPE token stream back to text: concatenate
    * the tokens and turn each [[EowMarker]] into a word boundary — the
    * inverse [[EowMarker]] exists to make possible (an unmarked stream
    * cannot tell "ing" + "est" across a boundary from within one word).
    * Pure expression: one `concat_ws` + one `replace` + a trim, no
    * shuffle. Exact inverse of eow segmentation by construction
    * (BpeSpec pins the roundtrip).
    */
  def detokenize(tokens: Column): Column =
    rtrim(regexp_replace(concat_ws("", tokens),
      java.util.regex.Pattern.quote(EowMarker), " "))

  /** Publish a trained merge table as a VERSIONED artifact (the
    * [[graft.model.AnnIndex]] discipline: tokenizers are models — a
    * retrain is the next version, serving replays a pinned one; a
    * tokenizer that drifts under a live corpus silently changes every
    * downstream token count).
    */
  def publishMerges(spark: SparkSession, root: String,
                    merges: DataFrame): String =
    Layout.publishVersion(spark, root,
      merges.select(col("round").cast("long"), col("lhs"), col("rhs"),
        col("merged"), col("pair_count").cast("long")))

  /** Load the LIVE merge table back in training order — bounded collect
    * (`rounds` rows).
    */
  def loadMerges(spark: SparkSession, root: String): Seq[(String, String)] =
    Layout.readCurrent(spark, root)
      .select(col("round").cast("long"), col("lhs"), col("rhs"))
      .collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq
}
