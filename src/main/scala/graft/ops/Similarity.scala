package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** North-star similarity search over `array<float>` embedding columns.
  *
  * Four tiers:
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set against the
  *    corpus; one corpus scan, no corpus shuffle. The baseline and the
  *    correctness oracle for the approximate tiers.
  *  - [[thresholdPairs]]: exact all-pairs >= threshold, distributed as a
  *    block-partitioned self-join (no broadcast nested loop).
  *  - [[lshThresholdPairs]]: approximate pairs — hyperplane-LSH bucket
  *    candidates, exact cosine verification. The scale path for near-dup.
  *  - [[lshTopK]]: approximate top-k — bucket equi-join, exact re-rank.
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
    // bounded top-k AGGREGATE instead of the row_number window (r18 perf):
    // the window form shuffled and sorted the full |corpus|·|queries| pair
    // stream to keep k rows per query; TopKAgg's map-side k-capped buffers
    // ship k pairs per (query × map partition) — identical results
    // (score desc, id asc, rnk = position), differentially pinned in
    // TopKAggSpec against the window form
    scored.groupBy(col("query_id"))
      .agg(graft.functions.expressions.TopKAgg.topK(
        col("score"), col("nn_id"), k).as("__tk"))
      .select(col("query_id"),
        posexplode(col("__tk")).as(Seq("__pos", "__p")))
      .select(col("query_id"), col("__p.id").as("nn_id"),
        round(col("__p.score"), 6).as("score"),
        (col("__pos") + 1).cast("long").as("rnk"))
  }

  /** Exact near-duplicate vector pairs (id_a < id_b, cosine >= threshold).
    *
    * Exact thresholded similarity is inherently Θ(n²) comparisons on dense
    * vectors (nothing can prune without losing pairs at the threshold), so
    * the scale lever is DISTRIBUTION, not asymptotics: the corpus is split
    * into `blocks` deterministic id-hash blocks and the triangular set of
    * block pairs (b1 <= b2) drives two equi-joins — a broadcast of the tiny
    * (b1,b2) table, then a shuffled equi-join on the block id. Every
    * unordered vector pair is produced exactly once, the O(n²) compare work
    * spreads over `blocks` shuffle partitions (AQE splits stragglers), and no
    * BroadcastNestedLoopJoin / driver-side corpus broadcast appears in the
    * plan. Raise `blocks` with corpus size; per-task compare work scales as
    * (n/blocks)² per block pair.
    *
    * When the use-case is near-duplicate detection at high thresholds,
    * prefer [[lshThresholdPairs]] — sub-quadratic candidates, same verified
    * output scores.
    */
  def thresholdPairs(corpus: DataFrame, threshold: Double, blocks: Int = 32): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val blk = pmod(xxhash64(col("vec_id")), lit(blocks)).cast("int")
    val l = corpus.select(col("vec_id").as("id_l"), col("embedding").as("e_l"),
      norm(col("embedding")).as("n_l"), blk.as("b_l"))
    val r = corpus.select(col("vec_id").as("id_r"), col("embedding").as("e_r"),
      norm(col("embedding")).as("n_r"), blk.as("b_r"))
    val blockPairs = (for { i <- 0 until blocks; j <- i until blocks } yield (i, j))
      .toDF("b1", "b2")
    l.join(broadcast(blockPairs), col("b_l") === col("b1"))
      .join(r, col("b_r") === col("b2"))
      // diagonal blocks would otherwise emit both orientations + self-pairs
      .filter(col("b1") < col("b2") || col("id_l") < col("id_r"))
      .withColumn("score", when(col("n_l") * col("n_r") === 0.0, 0.0)
        .otherwise(dot(col("e_l"), col("e_r")) / (col("n_l") * col("n_r"))))
      .filter(col("score") >= threshold)
      // cross-block pairs arrive in block order, not id order; dot/norm are
      // symmetric (same left-to-right element order), so canonicalizing ids
      // after scoring is bit-exact
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"),
        round(col("score"), 6).as("score"))
  }

  /** Near-duplicate pairs via hyperplane-LSH candidates + exact verification:
    * each vector gets one `nBits`-bit sign bucket per hash table; candidates
    * are pairs sharing a (table, bucket); true cosine filters them. Output ⊆
    * [[thresholdPairs]] with identical scores — LSH only GENERATES, never
    * scores.
    *
    * Recall knobs: a pair at cosine s collides per table with probability
    * (1 − acos(s)/π)^nBits, overall 1 − (1 − p)^nTables — e.g. s = 0.95,
    * nBits = 8, nTables = 12 → ~99.9%. Raise nTables for recall, nBits to
    * shrink buckets (cost is Σ_buckets |bucket|² candidate pairs). Designed
    * for HIGH thresholds; at low thresholds (≲0.6) collision probabilities
    * decay too fast and [[thresholdPairs]] is the honest choice.
    */
  def lshThresholdPairs(corpus: DataFrame, threshold: Double,
                        nBits: Int = 8, nTables: Int = 12, dim: Int = 64): DataFrame = {
    // One corpus scan computes every table's bucket via the native
    // HyperplaneBuckets expression (constant-size codegen loop over a plane
    // matrix — the composed literal-plane formulation unrolls ~25k terms at
    // these knobs, blows Janino's 64 KB method limit, and silently runs the
    // stage interpreted), then explodes to (table, bucket) rows.
    //
    // The vector and its norm RIDE ALONG on the bucket rows, so candidate
    // pairs are scored and threshold-filtered INSIDE the bucket-join stage
    // and the final distinct only shuffles surviving pairs. The previous
    // shape (distinct the candidate ids, then two joins back to the vectors)
    // shuffled every candidate pair-occurrence — on a high-baseline-
    // similarity corpus that distinct alone dominated the query (~10⁶ pair
    // rows for ~10² survivors). Cost of the carry: dim doubles per bucket
    // row in the self-join exchange (one exchange, reused by both sides) and
    // one exact dot per pair-OCCURRENCE rather than per distinct pair; both
    // scale linearly with nTables and win whenever survivors ≪ candidates —
    // the regime LSH is for. At very large dim, flip back to id-only
    // candidates + re-join.
    val buckets = corpus.select(col("vec_id").as("id"), col("embedding").as("e"),
        norm(col("embedding")).as("n"))
      .select(col("id"), col("e"), col("n"),
        posexplode(graft.functions.expressions.HyperplaneBuckets(
          col("e"), nBits, nTables, dim)).as(Seq("tbl", "bkt")))
    buckets.as("x").join(buckets.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bkt") === col("y.bkt") &&
          col("x.id") < col("y.id"))
      .withColumn("score", when(col("x.n") * col("y.n") === 0.0, 0.0)
        .otherwise(dot(col("x.e"), col("y.e")) / (col("x.n") * col("y.n"))))
      .filter(col("score") >= threshold)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        round(col("score"), 6).as("score"))
      .distinct()
  }

  /** Approximate top-k: hyperplane-LSH bucket join, exact re-rank in-bucket.
    * Multi-probe via `nTables` independent hash tables.
    *
    * ONE corpus scan: every table's bucket comes from the native
    * [[graft.functions.expressions.HyperplaneBuckets]] expression (constant
    * code size at any knob setting — the composed literal-plane formulation
    * blows Janino's 64 KB method limit at production knobs and drops the
    * stage to interpreted), posexploded to (tbl, bkt) rows. The query side
    * takes the same single-scan shape and is broadcast (queries are small
    * by contract, ×nTables bucket rows). Candidate pairs are scored with
    * exact cosine INSIDE the bucket join — the vectors ride along on the
    * bucket rows — so only (query_id, nn_id, score) survives into the
    * cross-table dedup shuffle; the per-table bucket seed stream matches
    * [[graft.functions.VectorFunctions.hyperplaneBucket]] seed = t exactly,
    * so results are bit-identical to the previous nTables-scan formulation
    * (and to the mirrored DuckDB oracle).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nBits: Int = 12, nTables: Int = 4, dim: Int = 64): DataFrame = {
    def buckets(df: DataFrame, idAs: String, embAs: String) =
      df.select(col("vec_id").as(idAs), col("embedding").as(embAs),
        posexplode(graft.functions.expressions.HyperplaneBuckets(
          col("embedding"), nBits, nTables, dim)).as(Seq("tbl", "bkt")))
    val cands = buckets(corpus, "nn_id", "c_emb")
      .join(broadcast(buckets(queries, "query_id", "q_emb")), Seq("tbl", "bkt"))
      .filter(col("nn_id") =!= col("query_id"))
      // same (query, neighbor) pair from several tables carries a
      // bit-identical score (same inputs, deterministic math), so the
      // dedup can drop either occurrence
      .select(col("query_id"), col("nn_id"), cosine(col("c_emb"), col("q_emb")).as("score"))
      .dropDuplicates("query_id", "nn_id")
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("nn_id"))
    cands.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("query_id"), col("nn_id"), round(col("score"), 6).as("score"),
        col("rnk").cast("long").as("rnk"))
  }

  /** All-corpus approximate kNN EDGE TABLE — the sub-quadratic feeder for
    * [[mutualPairs]] (and any kNN-graph consumer: manifold clustering,
    * hub detection, graph-based dedup). Same hyperplane-LSH tier as
    * [[lshTopK]], but the corpus plays BOTH sides: a (tbl, bkt) bucket
    * SELF-equi-join generates candidates (nothing broadcasts — unlike
    * [[lshTopK]]'s small-query contract, both sides here are corpus-
    * sized), exact cosine scores them inside the join, and a per-query
    * window keeps the top k.
    *
    * Scale shape: one corpus scan → nTables bucket rows per vector →
    * ONE shuffled equi-join on (tbl, bkt) — candidate volume is
    * Σ_buckets |bucket|², tuned by nBits (more bits → smaller buckets),
    * never the n² of [[bruteForceTopK]] with queries = corpus. Scores
    * are orientation-symmetric bit-for-bit (per-element products
    * commute, the fold order is the element order), so the (a→b) and
    * (b→a) edges this emits carry identical doubles — which is what
    * makes [[mutualPairs]]' reciprocal semi-join exact on top of it.
    *
    * Approximation contract: a true neighbor sharing NO bucket with its
    * query is missed (recall follows the [[lshThresholdPairs]] collision
    * algebra) — and missed edges can PROMOTE the next candidate into the
    * top k. The exact tier ([[bruteForceTopK]] + [[mutualPairs]]) is the
    * bounded differential anchor; this is the 100 TB path.
    */
  def lshKnnEdges(corpus: DataFrame, k: Int,
                  nBits: Int = 12, nTables: Int = 4, dim: Int = 64): DataFrame = {
    val buckets = corpus.select(col("vec_id").as("id"), col("embedding").as("e"),
      posexplode(graft.functions.expressions.HyperplaneBuckets(
        col("embedding"), nBits, nTables, dim)).as(Seq("tbl", "bkt")))
    val cands = buckets.as("x").join(buckets.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bkt") === col("y.bkt") &&
          col("x.id") =!= col("y.id"))
      // query side = y (the q38 oracle orientation); same-pair edges from
      // several tables carry bit-identical scores, either occurrence kept
      .select(col("y.id").as("query_id"), col("x.id").as("nn_id"),
        cosine(col("x.e"), col("y.e")).as("score"))
      .dropDuplicates("query_id", "nn_id")
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

  /** One k-means LLOYD ITERATION: assign every vector to its nearest
    * centroid ([[ivfAssign]]'s argmin — broadcast centroids, corpus never
    * shuffles for the assignment) and recompute each centroid as the
    * exact-decimal per-dimension mean of its members (the q57 centroid
    * shape). Returned per-dimension so the result is hash-checkable
    * (array columns stringify differently across engines); re-assemble
    * with `array_sort(collect_list(struct(i, mean_v)))` to feed the next
    * iteration. Centroids that attract no members simply emit no rows —
    * the caller decides the empty-cell policy (keep, re-seed, drop).
    *
    * Scale shape: one corpus scan + one (centroid, dim)-keyed aggregate —
    * map-side combinable, output k×d rows. Iterating to convergence is a
    * driver loop over THIS operator (each round is one job; same bounded-
    * rounds contract as [[graft.ops.MinHashDedup.dupGroups]]).
    *
    * @return (centroid_id, i, mean_v, n_members)
    */
  def kmeansStep(corpus: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssign(corpus, centroids)
      .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy("centroid_id", "i")
      .agg(
        (sum(col("v").cast("double")
          .cast(org.apache.spark.sql.types.DecimalType(38, 8))).cast("double") /
          count(lit(1))).as("mean_v"),
        count(lit(1)).as("n_members"))
      .select(col("centroid_id"), col("i").cast("long").as("i"),
        col("mean_v"), col("n_members"))

  /** IVF SERVING: route each query to its `nprobe` nearest centroid cells,
    * exact-cosine rerank only within those cells — the full probe path on
    * top of [[ivfAssign]]'s partitioning. Deterministic end to end (argmin
    * and rank ties break on ids), so the whole approximate index is
    * oracle-checkable. Scale shape: one corpus pass for assignment; the
    * probe table (|queries| × nprobe rows) is explicitly BROADCAST into the
    * cell join — its window+cross-join lineage would otherwise defeat
    * Catalyst's size estimate and shuffle the corpus by cell; centroids
    * broadcast twice (assign + probe). The corpus itself never shuffles.
    */
  def ivfSearch(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
                nprobe: Int, k: Int): DataFrame = {
    val assigned = ivfAssign(corpus, centroids)
      .select(col("vec_id").as("nn_id"), col("embedding").as("c_emb"),
        col("centroid_id"))
    val cent = centroids.select(col("vec_id").as("centroid_id"),
      col("embedding").as("cent_emb"), dot(col("embedding"), col("embedding")).as("c2"))
    val wProbe = Window.partitionBy("query_id").orderBy(col("qdist"), col("centroid_id"))
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        dot(col("embedding"), col("embedding")).as("a2"))
      .crossJoin(broadcast(cent))
      .withColumn("qdist",
        col("a2") + col("c2") - lit(2.0) * dot(col("q_emb"), col("cent_emb")))
      .withColumn("pr", row_number().over(wProbe)).filter(col("pr") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("centroid_id"))
    val wK = Window.partitionBy("query_id").orderBy(col("score").desc, col("nn_id"))
    assigned.join(broadcast(probes), "centroid_id")
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("score", cosine(col("c_emb"), col("q_emb")))
      .withColumn("rnk", row_number().over(wK)).filter(col("rnk") <= k)
      .select(col("query_id"), col("nn_id"), col("centroid_id"),
        round(col("score"), 6).as("score"), col("rnk").cast("long").as("rnk"))
  }

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the corpus around `centroids` ([[ivfAssign]] — broadcast
    * centroids, the corpus never shuffles for assignment), then WITHIN each
    * cluster drop every vector that has a semantically-equivalent
    * lower-id survivor (cosine >= `threshold` to ANY lower id in the
    * cluster). Keeps exactly the per-cluster id-minimal representatives —
    * deterministic, so the whole pipeline is oracle-checkable.
    *
    * Scale shape: the quadratic compare is confined to each cluster by a
    * single equi-join on `centroid_id` (never an all-pairs cross join);
    * with k centroids the expected compare volume drops k-fold vs
    * [[thresholdPairs]], which is the entire point of SemDeDup — cheap
    * coarse clustering buys away most of the O(n²). A pathological
    * mega-cluster re-concentrates the quadratic cost into one task group;
    * if cluster sizes are unbounded, split clusters with the deterministic
    * block-pair trick of [[thresholdPairs]] (same join, composite key
    * (centroid_id, block_pair)) — at the corpus sizes where SemDeDup is
    * run, cluster counts are chosen so members-per-cluster stays bounded.
    *
    * Pruning is by EXISTENCE of a lower-id near-duplicate (not by
    * transitive closure): a chain a~b~c with cos(a,c) < threshold keeps a
    * and c — SemDeDup's epsilon-ball semantics, distinct from
    * [[graft.ops.MinHashDedup.dupGroups]]' connected components.
    *
    * @return one row per KEPT vector: (vec_id, centroid_id)
    */
  def semanticDedup(corpus: DataFrame, centroids: DataFrame,
                    threshold: Double): DataFrame = {
    val assigned = ivfAssign(corpus, centroids)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
    def side(id: String, emb: String, n: String) =
      assigned.select(col("centroid_id"), col("vec_id").as(id),
        col("embedding").as(emb), norm(col("embedding")).as(n))
    val shadowed = side("id_a", "e_a", "n_a")
      .join(side("id_b", "e_b", "n_b"), Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", when(col("n_a") * col("n_b") === 0.0, 0.0)
        .otherwise(dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b"))))
      .filter(col("score") >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    assigned.join(shadowed, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("centroid_id"))
  }

  /** Mutual-kNN pairs from a kNN EDGE TABLE (any tier's output —
    * [[bruteForceTopK]], [[lshTopK]], IVF probes): keep (a, b) iff
    * a ∈ kNN(b) AND b ∈ kNN(a). The reciprocal filter that turns a noisy
    * kNN graph into the high-precision edge set clustering / near-dup /
    * manifold pipelines build on — one-sided neighbors are typically hub
    * artifacts (a vector near the centroid of everything is in everyone's
    * list, but almost no one is in its).
    *
    * Scale shape: ONE semi-join of the edge table against its own swap,
    * at EDGE grain (n·k rows) — the corpus and its vectors never appear.
    * Each unordered pair emits once (id_a < id_b).
    */
  def mutualPairs(knn: DataFrame, queryCol: String, nnCol: String): DataFrame = {
    val e = knn.select(col(queryCol).as("id_a"), col(nnCol).as("id_b"))
    val swapped = e.select(col("id_b").as("id_a"), col("id_a").as("id_b"))
    e.join(swapped, Seq("id_a", "id_b"), "left_semi")
      .filter(col("id_a") < col("id_b"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
    * the diversity selector every retrieval-augmented / few-shot-example
    * pipeline runs AFTER similarity search: from each query's CANDIDATE
    * list, greedily pick `k` items maximizing
    * `λ·rel − (1−λ)·max_{s∈selected} cos(c, s)` — relevant, but not
    * redundant with what's already picked. The first pick maximizes pure
    * relevance (empty selected set ⇒ diversity term 0).
    *
    * Input contract: `cands` is per-query BOUNDED (the top-N cut of a
    * prior retrieval stage — [[bruteForceTopK]], [[lshTopK]], BM25, RRF).
    * The greedy loop is inherently sequential in k, so the operator runs
    * k−1 rounds of joins at (query, candidate) grain: each round is ≤ N·i
    * pairs per query (i = picks so far), the CORPUS never appears, and
    * the per-round tables are cached ([[graft.util.Caches]]) to cut
    * lineage. At 100 TB the queries×N candidate table is the small output
    * of the scale-path retrieval — millions of rows, not the corpus.
    *
    * Determinism: cosine is the native left-to-right [[dot]] over norms
    * computed once per row; every argmax breaks ties on id ascending; the
    * MMR combine is one fixed IEEE tree, micro-quantized on output only.
    * λ must be exactly representable (0.75, 0.5 …) for oracle replay —
    * callers own that, as q37 owns its thresholds.
    *
    * @param k      picks per query (fewer if the candidate list is shorter)
    * @param lambda relevance weight in [0, 1]
    * @return (queryCol, idCol, step, mmr_micro) — step 1 is the first pick
    */
  def mmrSelect(cands: DataFrame, queryCol: String, idCol: String,
                relCol: String, vecCol: String, k: Int,
                lambda: Double): DataFrame = {
    require(k >= 1, s"mmrSelect: k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"mmrSelect: lambda must be in [0, 1], got $lambda")
    import graft.util.Caches
    val base = Caches.cache(cands
      .filter(col(queryCol).isNotNull && col(idCol).isNotNull &&
        col(relCol).isNotNull && col(vecCol).isNotNull)
      .select(col(queryCol).as("__q"), col(idCol).as("__id"),
        col(relCol).cast("double").as("__rel"), col(vecCol).as("__v"),
        norm(col(vecCol)).as("__n"))).toDF
    def pick(scored: DataFrame, mmr: org.apache.spark.sql.Column): DataFrame = {
      val w = Window.partitionBy(col("__q"))
        .orderBy(mmr.desc, col("__id"))
      scored.withColumn("__mmr", mmr)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("__q"), col("__id"), col("__mmr"))
    }
    var selected = Caches.cache(
      pick(base, lit(lambda) * col("__rel")).withColumn("step", lit(1))).toDF
    for (step <- 2 to k) {
      val selVec = base.join(selected.select("__q", "__id"), Seq("__q", "__id"))
        .select(col("__q"), col("__v").as("__sv"), col("__n").as("__sn"))
      val remaining = base.join(selected.select("__q", "__id"),
        Seq("__q", "__id"), "left_anti")
      val divs = remaining.join(selVec, Seq("__q"))
        .withColumn("__sim", when(col("__n") * col("__sn") === 0.0, 0.0)
          .otherwise(dot(col("__v"), col("__sv")) /
            (col("__n") * col("__sn"))))
        .groupBy(col("__q"), col("__id"), col("__rel"))
        .agg(max(col("__sim")).as("__div"))
      val next = pick(divs,
        lit(lambda) * col("__rel") - lit(1.0 - lambda) * col("__div"))
        .withColumn("step", lit(step))
      selected = Caches.cache(selected.unionByName(next)).toDF
    }
    selected.select(col("__q").as(queryCol), col("__id").as(idCol),
      col("step").cast("long").as("step"),
      floor(col("__mmr") * lit(1000000.0) + lit(0.5)).cast("long")
        .as("mmr_micro"))
  }
}
