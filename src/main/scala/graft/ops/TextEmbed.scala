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
  def hashEmbed(docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    val tok = docs
      .select(col(idCol).as("id"), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("id"),
        pmod(xxhash64(col("tok")), lit(dim)).cast("int").as("pos"),
        when(shiftright(xxhash64(col("tok")), 32).bitwiseAND(1L) === 1L, 1.0)
          .otherwise(-1.0).as("sgn"))
    tok.groupBy("id", "pos").agg(sum(col("sgn")).as("w"))
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("pos"), col("w")))).as("m"))
      .select(col("id").as(idCol),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("embedding"))
  }

  /** Cosine near-duplicate TEXT pairs via hashed embeddings — approximate
    * (hash collisions fold token dimensions) but model-free; verify exact
    * candidates with [[SetSimJoin]] when precision matters.
    */
  def cosineNearDupDocs(docs: DataFrame, idCol: String, textCol: String,
                        dim: Int, threshold: Double): DataFrame =
    Similarity.thresholdPairs(
      hashEmbed(docs, idCol, textCol, dim)
        .withColumnRenamed(idCol, "vec_id")
        // both sides of the pair self-join read this — don't rebuild the
        // tokenize→hash→aggregate pipeline twice
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      threshold)
}
