package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** North-star similarity search over `array<float>` embedding columns.
  *
  * Three tiers:
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set against the
  *    corpus; one corpus scan, no corpus shuffle. The baseline and the
  *    correctness oracle for the approximate tiers.
  *  - [[thresholdPairs]]: exact all-pairs >= threshold within blocking keys.
  *  - [[lshTopK]]: approximate — random-hyperplane bucket equi-join first,
  *    exact cosine re-rank within buckets. At 100 TB the bucket join replaces
  *    the corpus×query cross product; recall is tuned by nBits/nTables.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector. `queries` must be small
    * enough to broadcast (the driver enforces nothing — callers own this).
    * Deterministic: ties broken by corpus id ascending.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // Norms are computed once per row/query (aliased columns), not per pair —
    // the per-pair work is exactly one native dot product.
    val c = corpus.select(col("vec_id").as("nn_id"), col("embedding").as("c_emb"),
      norm(col("embedding")).as("c_n"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_n"))
    val scored = c.join(broadcast(q), col("nn_id") =!= col("query_id"))
      .withColumn("score", when(col("c_n") * col("q_n") === 0.0, 0.0)
        .otherwise(dot(col("c_emb"), col("q_emb")) / (col("c_n") * col("q_n"))))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("nn_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("query_id"), col("nn_id"), round(col("score"), 6).as("score"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Exact near-duplicate vector pairs (id_a < id_b, cosine >= threshold).
    * All-pairs within the full corpus — O(n²/2) comparisons via self-join;
    * use only when n is bounded or pre-blocked. The scale path is [[lshTopK]]
    * buckets followed by this verification within buckets.
    */
  def thresholdPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("e_a"),
      norm(col("embedding")).as("n_a"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("e_b"),
      norm(col("embedding")).as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("score", when(col("n_a") * col("n_b") === 0.0, 0.0)
        .otherwise(dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b"))))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("score"), 6).as("score"))
  }

  /** Approximate top-k: hyperplane-LSH bucket join, exact re-rank in-bucket.
    * Multi-probe via `nTables` independent hash tables unioned before rank.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nBits: Int = 12, nTables: Int = 4, dim: Int = 64): DataFrame = {
    val tables = (0 until nTables).map { t =>
      val cb = corpus.select(col("vec_id").as("nn_id"), col("embedding").as("c_emb"),
        hyperplaneBucket(col("embedding"), nBits, seed = t, dim).as("bucket"))
      val qb = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        hyperplaneBucket(col("embedding"), nBits, seed = t, dim).as("bucket"))
      cb.join(broadcast(qb), Seq("bucket")).filter(col("nn_id") =!= col("query_id"))
        .select(col("query_id"), col("nn_id"), col("c_emb"), col("q_emb"))
    }
    val cands = tables.reduce(_ unionByName _).dropDuplicates("query_id", "nn_id")
      .withColumn("score", cosine(col("c_emb"), col("q_emb")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("nn_id"))
    cands.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("query_id"), col("nn_id"), round(col("score"), 6).as("score"),
        col("rnk").cast("long").as("rnk"))
  }

  /** IVF-style clustered search: assign every corpus vector to its nearest
    * centroid (broadcast centroids), then search only the query's probe
    * cluster(s). Centroids here are caller-provided (e.g. sampled vectors) —
    * a k-means fit is an offline concern, the serving plan is what matters
    * for scale: corpus partitioned by cluster id → queries touch 1/nlist of
    * the data.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    // ‖a−c‖² = ‖a‖² + ‖c‖² − 2a·c: norms once per row/centroid, one native
    // dot per (row, centroid).
    val cent = centroids.select(col("vec_id").as("centroid_id"),
      col("embedding").as("cent_emb"), dot(col("embedding"), col("embedding")).as("c2"))
    val scored = corpus
      .withColumn("a2", dot(col("embedding"), col("embedding")))
      .crossJoin(broadcast(cent))
      .withColumn("cdist",
        col("a2") + col("c2") - lit(2.0) * dot(col("embedding"), col("cent_emb")))
    val w = Window.partitionBy("vec_id").orderBy(col("cdist"), col("centroid_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        round(col("cdist"), 6).as("cdist"))
  }
}
