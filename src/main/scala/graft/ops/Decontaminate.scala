package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination: score each corpus document by its n-gram
  * overlap with a (small) benchmark/eval set, the standard guard against
  * test-set leakage into training data (north-star [EXT] operator).
  *
  * Scale shape: the benchmark shingle set is tiny relative to the corpus
  * (eval suites are fixed-size; the corpus is 100 TB), so it is DISTINCTed
  * and broadcast — the corpus side is one tokenize + explode + broadcast
  * semi-join + hash re-aggregate, all linear, no shuffle of corpus text and
  * no pairwise join. Per-doc shingles are distinct, so the semi-join hit
  * count IS the intersection size |sh(doc) ∩ sh(benchmark)|.
  */
object Decontaminate {

  /** Per-document overlap against the union of the benchmark's shingles.
    *
    * @return (idCol, n_shingles, n_hit, overlap) for every document with at
    *         least one shingle; `overlap` = n_hit / n_shingles in [0,1] —
    *         filter `overlap >= t` (or n_hit >= k) downstream to drop
    *         contaminated docs.
    */
  def overlapStats(docs: DataFrame, benchmark: DataFrame,
                   idCol: String, textCol: String, shingleN: Int): DataFrame = {
    def sh(c: org.apache.spark.sql.Column) =
      TextFunctions.shingles(TextFunctions.tokens(c), shingleN)
    val benchSh = benchmark
      .select(explode(sh(col(textCol))).as("tok")).distinct()
    // The shingled corpus feeds both the explode/semi-join branch and the
    // per-doc size branch — persist (tracked) so the corpus is tokenized and
    // shingled exactly once, not twice (shingling is the dominant per-doc
    // cost at corpus scale).
    val d = graft.util.Caches.cache(
      docs.select(col(idCol), sh(col(textCol)).as("sh"))
        .filter(size(col("sh")) > 0)).toDF
    val hits = d.select(col(idCol), explode(col("sh")).as("tok"))
      .join(broadcast(benchSh), Seq("tok"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_hit"))
    d.select(col(idCol), size(col("sh")).cast("long").as("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("overlap", col("n_hit").cast("double") / col("n_shingles"))
  }
}
