package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Hashing-trick bag-of-tokens embeddings: the cheap, deterministic
  * text→vector bridge. Each token contributes ±1 (sign from a hash bit) at
  * position xxhash64(token) mod dim; documents become dim-length double
  * vectors that feed the [[Similarity]] operators — cosine near-dup and ANN
  * over TEXT with no model artifact.
  *
  * Shape: explode → codegen hash aggregate by (doc, position) → dense
  * array reconstruction from a per-row map (attribute reads inside the
  * lambda are O(1) row-field accesses — NOT the lambda-external-expression
  * re-evaluation trap, see SCALE.md). Cost is O(total tokens), one shuffle.
  */
object TextEmbed {

  /** @return (idCol, embedding: array<double>) — one row per input doc with
    *         at least one token.
    */
  def hashEmbed(docs: DataFrame, idCol: String, textCol: String, dim: Int,
                portable: Boolean = false): DataFrame = {
    // portable tier: position and sign derive from TextFunctions.polyHash
    // (pos = h mod dim, sign bit = (h div dim) mod 2 — div so the sign
    // source bits are independent of the position bits), each replayable
    // by the external oracle; h < P < 2^53, so the double-division floor
    // is exact and matches integer `//` in any engine
    val hashed =
      if (portable) {
        val h = TextFunctions.polyHash(col("tok"))
        docs.select(col(idCol).as("id"),
            explode(TextFunctions.tokens(col(textCol))).as("tok"))
          .select(col("id"), h.as("h"))
          .select(col("id"),
            pmod(col("h"), lit(dim.toLong)).cast("int").as("pos"),
            when(pmod(floor(col("h") / lit(dim.toDouble)).cast("long"),
              lit(2L)) === 1L, 1.0).otherwise(-1.0).as("sgn"))
      } else docs
        .select(col(idCol).as("id"), explode(TextFunctions.tokens(col(textCol))).as("tok"))
        .select(col("id"),
          pmod(xxhash64(col("tok")), lit(dim)).cast("int").as("pos"),
          when(shiftright(xxhash64(col("tok")), 32).bitwiseAND(1L) === 1L, 1.0)
            .otherwise(-1.0).as("sgn"))
    hashed.groupBy("id", "pos").agg(sum(col("sgn")).as("w"))
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("pos"), col("w")))).as("m"))
      .select(col("id").as(idCol),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("embedding"))
  }

  /** Cosine near-duplicate TEXT pairs via hashed embeddings — approximate
    * (hash collisions fold token dimensions) but model-free; verify exact
    * candidates with [[SetSimJoin]] when precision matters.
    *
    * Candidates come from [[Similarity.lshThresholdPairs]] — hyperplane-LSH
    * buckets, never all-pairs — then exact cosine verification; recall knobs
    * (`nBits`, `nTables`) are documented there. [[cosineNearDupDocsExact]] is
    * the exact-tier differential oracle.
    *
    * The default knobs are tuned for corpora with HIGH baseline similarity
    * (this synthetic corpus's median pair cosine is ~0.63): 16-bit buckets
    * keep the median pair's per-table collision odds at ~0.5%, while 24
    * tables push recall at the 0.96+ scores of true near-dups past 99.9%
    * (verified recall 1 vs the exact tier at sf0.01, TextVectorSpec).
    */
  def cosineNearDupDocs(docs: DataFrame, idCol: String, textCol: String,
                        dim: Int, threshold: Double,
                        nBits: Int = 16, nTables: Int = 24,
                        portable: Boolean = false): DataFrame =
    Similarity.lshThresholdPairs(
      embeddedCorpus(docs, idCol, textCol, dim, portable), threshold,
      nBits, nTables, dim)

  /** Exact all-pairs variant (block-partitioned equi-join, Θ(n²) compares) —
    * the correctness oracle for [[cosineNearDupDocs]] and the honest choice
    * at thresholds too low for LSH recall.
    */
  def cosineNearDupDocsExact(docs: DataFrame, idCol: String, textCol: String,
                             dim: Int, threshold: Double,
                             portable: Boolean = false): DataFrame =
    Similarity.thresholdPairs(
      embeddedCorpus(docs, idCol, textCol, dim, portable), threshold)

  private def embeddedCorpus(docs: DataFrame, idCol: String, textCol: String,
                             dim: Int, portable: Boolean = false): DataFrame =
    // several joins downstream read the embeddings — don't rebuild the
    // tokenize→hash→aggregate pipeline per consumer (tracked; Caches.releaseAll
    // frees it once the result is materialized)
    graft.util.Caches.cache(
      hashEmbed(docs, idCol, textCol, dim, portable)
        .withColumnRenamed(idCol, "vec_id")).toDF
}
