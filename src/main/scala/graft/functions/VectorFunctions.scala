package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions (north-star similarity surface; absent
  * from the reference). Vectors are plain `array<float>` columns
  * (embeddings.parquet) — no UDT, no MLlib Vector boxing.
  *
  * All math is expressed with higher-order array functions over doubles:
  * per-element float→double casts are exact, multiplication is IEEE-
  * deterministic, and `aggregate` folds left-to-right in array order — so a
  * DuckDB loop over the same list produces bit-identical results, which the
  * oracle compare relies on. Codegen-friendly; if profiling at scale shows
  * boxing overhead, the designated upgrade is a fused native Catalyst
  * `Expression` with `doGenCode` (same semantics, same results).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; zero vectors score 0. The zero-denominator branch is
    * guarded BEFORE the division — under ANSI mode (Spark 4 default) even a
    * double division by zero throws rather than yielding NaN.
    */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane (SimHash-style) LSH bucket for cosine similarity:
    * sign pattern of the vector against `nBits` pseudo-random hyperplanes.
    * Hyperplane j's i-th component is derived from xxhash64(seed, j, i) — no
    * stored model, fully deterministic, computable engine-side at any scale.
    */
  def hyperplaneBucket(v: Column, nBits: Int, seed: Int): Column = {
    val bits = (0 until nBits).map { j =>
      // pseudo-random ±1 components: hash(i, j) parity
      val proj = aggregate(
        zip_with(v, transform(sequence(lit(0), size(v) - 1),
          i => pmod(xxhash64(lit(seed), lit(j), i), lit(2)) * 2 - 1),
          (x, s) => x.cast("double") * s.cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
