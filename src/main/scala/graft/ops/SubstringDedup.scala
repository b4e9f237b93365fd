package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact-substring duplication analysis — the corpus-level repeated-span
  * detector of Lee et al. 2022 ("Deduplicating Training Data Makes Language
  * Models Better"), re-expressed Spark-first at token granularity
  * (north-star [EXT]; the reference has no text surface at all).
  *
  * The suffix-array machinery of the paper is a single-machine construction;
  * the distributed shape that computes the SAME set of length-≥L duplicated
  * regions is gram-based: a span of tokens is duplicated iff every length-L
  * token window inside it occurs at least twice in the corpus (counting all
  * positions, so an in-document repeat counts exactly like a cross-document
  * one). Emitting every length-L window with its position, keeping the
  * windows whose content occurs ≥ 2 times, and unioning each document's
  * surviving [pos, pos+L) intervals therefore reconstructs, per document,
  * precisely the maximal regions every length-L substring of which is
  * repeated — the paper's mark phase, as three shuffles:
  *
  *  1. one generator projection (no shuffle): doc → (doc, pos, gram-hash)
  *     for every window start; the token array is bound to an attribute
  *     first so the per-window `slice` re-reads a row attribute, not the
  *     tokenizer expression;
  *  2. one hash aggregate on the 64-bit gram hash (map-side partial combine
  *     collapses in-partition repeats) filtered to count ≥ 2 — the
  *     DUPLICATED gram set, which is then equi-joined back to the
  *     positions. The join ships (hash, doc, pos) pairs only: the corpus
  *     text itself never shuffles, and the L-fold blowup of materializing
  *     gram TEXT (the naive shape) is avoided entirely — at 100 TB the
  *     shuffle is 24 bytes per token position, not L tokens per position.
  *     Hot grams (boilerplate repeated 10⁹ times) skew the join's probe
  *     side; AQE's skew-join split handles them because the build row for
  *     a hash is exactly one (hash, cnt) pair;
  *  3. one per-document window pass (partition by doc, order by pos — the
  *     standard gaps-and-islands merge) that unions overlapping-or-touching
  *     intervals into maximal spans and aggregates per-document totals.
  *
  * Grams are compared BY 64-BIT HASH (`xxhash64` of the space-joined window),
  * not by text: two distinct grams colliding would take ~2³² distinct grams
  * (birthday bound) to become likely, and a collision's only effect is one
  * extra marked span — the trade every large-scale exact-substr
  * implementation makes to keep the shuffle narrow. The differential spec
  * pins hash-marking ≡ text-marking on the test corpus.
  */
object SubstringDedup {

  /** Per-document duplicated-span summary.
    *
    * @param gramLen window length L in tokens (the paper uses 50 BPE
    *                tokens; choose by corpus granularity)
    * @return one row per document that contains at least one duplicated
    *         window: (idCol, n_tokens, n_dup_grams, n_spans, n_dup_tokens,
    *         dup_frac) where n_spans counts maximal merged [pos, pos+L)
    *         islands, n_dup_tokens their total token coverage, and
    *         dup_frac = n_dup_tokens / n_tokens rounded to 6 dp.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      gramLen: Int): DataFrame = {
    val positions = dupPositions(docs, idCol, textCol, gramLen)
    val L = gramLen.toLong
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    // island head: this window starts past every previous window's end —
    // interval-UNION semantics, so touching windows ([0,L) then [L,2L))
    // merge into one contiguous duplicated region, exactly the maximal
    // spans the paper's mark phase produces
    val prevEnd = max(col("pos") + L).over(
      byDoc.rowsBetween(Window.unboundedPreceding, -1))
    positions
      .withColumn("__head",
        when(col("pos") > coalesce(prevEnd, lit(Long.MinValue)), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__head")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("n_tokens"), col("__island"))
      .agg(count(lit(1)).as("__grams"),
        min(col("pos")).as("__s"), (max(col("pos")) + L).as("__e"))
      .groupBy(col(idCol), col("n_tokens"))
      .agg(sum(col("__grams")).as("n_dup_grams"),
        count(lit(1)).as("n_spans"),
        sum(col("__e") - col("__s")).as("n_dup_tokens"))
      .withColumn("dup_frac",
        round(col("n_dup_tokens").cast("double") / col("n_tokens"), 6))
  }

  /** The REMOVAL phase of Lee et al. 2022: rewrite each document with its
    * duplicated token regions excised — every token covered by a length-L
    * window occurring ≥ 2 times corpus-wide is dropped (all copies, the
    * released exact-substring tool's policy: both occurrences are marked,
    * so both are cut), the survivors re-join on single spaces.
    *
    * Shape on top of [[dupPositions]]: the marked windows island-merge
    * per document into maximal spans (same gaps-and-islands pass as
    * [[duplicatedSpans]]), the spans collect into ONE small array per
    * document (spans are merged maximal intervals — a document carries
    * FEW of them, never O(tokens)), and the rewrite is a codegen'd
    * higher-order `filter((tok, i) -> no span covers i)` over the token
    * array — per-document work, no extra shuffle beyond the mark phase,
    * and the corpus text still never shuffles (the spans join back to
    * the docs BY ID; the heavy text column stays where it was read).
    * Documents with no duplicated window pass through untouched via the
    * left join.
    *
    * @return (idCol, n_tokens, n_kept, clean_text): original token count,
    *         surviving token count, and the re-joined cleaned text
    */
  def removeSpans(docs: DataFrame, idCol: String, textCol: String,
                  gramLen: Int): DataFrame = {
    val L = gramLen.toLong
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val prevEnd = max(col("pos") + L).over(
      byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = dupPositions(docs, idCol, textCol, gramLen)
      .withColumn("__head",
        when(col("pos") > coalesce(prevEnd, lit(Long.MinValue)), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__head")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + L).as("e"))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("s"), col("e"))).as("__spans"))
    docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .join(spans, Seq(idCol), "left")
      .withColumn("__kept",
        // blank text splits to [""] — normalize to zero kept tokens
        when(col("n_tokens") === 0L,
          array().cast(org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))
          .when(col("__spans").isNull, col("__toks")).otherwise(
          // 0-based token index i survives iff no span [s, e) covers it
          expr("filter(__toks, (t, i) -> " +
            "NOT exists(__spans, sp -> i >= sp.s AND i < sp.e))")))
      .select(col(idCol), col("n_tokens"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(col("__kept"), " ").as("clean_text"))
  }

  /** (idCol, n_tokens, pos) of every length-`gramLen` window whose content
    * occurs ≥ 2 times corpus-wide — the raw mark set [[duplicatedSpans]]
    * merges. Exposed separately so a removal pass (rewrite each doc
    * dropping marked tokens) can consume positions directly.
    */
  def dupPositions(docs: DataFrame, idCol: String, textCol: String,
                   gramLen: Int): DataFrame = {
    require(gramLen > 0, s"gramLen must be > 0, got $gramLen")
    val grams = gramHashes(docs, idCol, textCol, gramLen)
    val dups = grams.groupBy("__h").agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= 2)
    grams.join(dups, "__h").select(col(idCol), col("n_tokens"), col("pos"))
  }

  /** (idCol, n_tokens, pos, __h): every window start with the xxhash64 of
    * its space-joined tokens. One projection + one generator, no shuffle.
    */
  private def gramHashes(docs: DataFrame, idCol: String, textCol: String,
                         gramLen: Int): DataFrame =
    docs.select(col(idCol),
        TextFunctions.tokens(col(textCol)).as("__toks"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= gramLen.toLong)
      .select(col(idCol), col("n_tokens"), col("__toks"),
        explode(sequence(lit(0L), col("n_tokens") - gramLen)).as("pos"))
      .select(col(idCol), col("n_tokens"), col("pos"),
        xxhash64(array_join(slice(col("__toks"),
          (col("pos") + 1).cast("int"), lit(gramLen)), " ")).as("__h"))
}
