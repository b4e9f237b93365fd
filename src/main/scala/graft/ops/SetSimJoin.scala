package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Exact n-gram Jaccard similarity self-join via an inverted index.
  *
  * For any threshold t > 0, a qualifying pair shares at least one shingle, so
  * the exact result over all pairs equals the result over pairs generated
  * within per-shingle buckets. Each bucket's id list is collected once and
  * its C(df, 2) pairs exploded positionally; `groupBy(pair).count()` then
  * yields intersection sizes directly — no per-pair array intersection is
  * ever materialized, and (sizes riding on the postings) no per-id size
  * join either: the whole computation is codegen'd scans and exactly two
  * shuffles (bucket build, pair aggregate).
  *
  * Scale shape: cost is Σ_token C(df(token), 2) pair-occurrences, not
  * C(n, 2) — sublinear in pairs whenever shingles discriminate. Hot shingles
  * (stop-shingles) are the skew risk at 100 TB: one shingle shared by 1% of
  * a corpus makes a single join key quadratic. Mitigation is `dfCap`: index
  * postings for shingles with document frequency > cap are dropped, bounding
  * any key's pair contribution to C(cap, 2). Capped shingles still count in
  * the denominator sizes, so surviving pairs keep their TRUE Jaccard (never
  * inflated) and the only loss is pairs whose qualifying overlap depends on
  * stop-shingles — the conservative direction for dedup.
  */
object SetSimJoin {

  /** Exact Jaccard >= threshold pairs (id_a < id_b), optionally blocked by an
    * equality column (e.g. lang) that both sides must share.
    *
    * @param dfCap drop inverted-index postings for shingles whose document
    *              frequency (within a block) exceeds the cap; None = exact.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int, threshold: Double,
                   blockCol: Option[String] = None,
                   dfCap: Option[Long] = None): DataFrame = {
    val blockCols = blockCol.toSeq
    val keyCols = (blockCols :+ "tok").map(col)
    // Postings carry the doc's set SIZE alongside its id, so the pair rows
    // built below are self-contained and no per-id size join is ever needed.
    // Shingles shrink to xxhash64 keys BEFORE the explode: every downstream
    // exchange, aggregate, and bucket sort then works on 8-byte longs
    // instead of ~25-byte UTF8 n-grams. Intersection counts are unchanged
    // unless two distinct shingles of one doc pair collide in 2^64 — odds
    // ~|shingles|²/2^64, vanishing even at corpus scale per block.
    // NULL block values are null-rejecting, matching the SQL `x.block =
    // y.block` join this bucket formulation replaced: a doc with an unknown
    // block belongs to no block and never pairs (grouping would otherwise
    // silently treat NULL as one shared block).
    val invAll = docs
      .filter(blockCols.map(col(_).isNotNull).foldLeft(lit(true))(_ && _))
      .select((blockCols.map(col) :+ col(idCol).as("id")) :+
        TextFunctions.shingles(TextFunctions.tokens(col(textCol)), shingleN).as("sh"): _*)
      .filter(size(col("sh")) > 0)
      .select(blockCols.map(col) :+ col("id") :+ size(col("sh")).as("sz") :+
        explode(transform(col("sh"), s => xxhash64(s))).as("tok"): _*)
    val inv = dfCap match {
      case Some(cap) =>
        // Hot-shingle postings are removed BEFORE bucket collection with a
        // broadcast ANTI-join against the (tiny, by construction:
        // ≤ |postings|/cap keys) over-cap key set from a partial-aggregating
        // hash count. Doing it pre-collection also bounds the bucket arrays
        // built below to `cap` elements — no stop-shingle ever materializes
        // a giant in-memory posting list. The postings feed both the count
        // and the anti-join left side — persist once, tracked, so the
        // corpus is tokenized exactly once.
        val cached = graft.util.Caches.cache(invAll).toDF
        val hot = cached.groupBy(keyCols: _*)
          .agg(count(lit(1)).as("__df")).filter(col("__df") > cap)
          .select(keyCols: _*)
        cached.join(broadcast(hot), blockCols :+ "tok", "left_anti")
      case None => invAll
    }

    // Bucket the index by shingle and explode each bucket's C(df, 2) id
    // pairs from the collected (id, sz) array: one shuffle to build buckets,
    // one to aggregate pairs — replacing the posting self-join formulation
    // (sort-merge join + two size joins = 3 extra exchanges and a full
    // posting sort; measured ~2× this plan's latency at sf0.1). sort_array
    // on the structs orders by id (first field), giving id_a < id_b
    // positionally.
    val buckets = inv.groupBy(keyCols: _*)
      .agg(sort_array(collect_list(struct(col("id"), col("sz")))).as("ms"))
      .filter(size(col("ms")) > 1)
    // Pairs stream through two chained generators: posexplode picks the left
    // element, a second explode walks its tail slice. Each intermediate value
    // is at most one df-sized slice, never the full C(df, 2) pair set — a
    // single flattened pair array would hold ~2.4e9 structs for one df≈70k
    // stop-shingle on the uncapped path (JVM array overflow / OOM), where
    // this shape just takes its time.
    val pairs = buckets
      .select(col("ms"), posexplode(col("ms")).as(Seq("i", "a")))
      .select(col("a"),
        explode(slice(col("ms"), col("i") + lit(2), size(col("ms")))).as("b"))
      .select(col("a.id").as("id_a"), col("a.sz").as("sz_a"),
        col("b.id").as("id_b"), col("b.sz").as("sz_b"))

    pairs
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact cross-corpus Jaccard >= threshold pairs: NEW documents against an
    * EXISTING corpus — the incremental-dedup shape (dedup an incoming crawl
    * against the training set already on disk) where a self-join over
    * `new ∪ old` would redundantly re-pair the old corpus against itself
    * every increment. Same inverted-index layout as [[jaccardPairs]]; the
    * index join is new-postings ⋈ old-postings on the shingle key, so cost
    * is Σ_token df_new(token)·df_old(token) — linear in the increment when
    * shingles discriminate, never C(|old|, 2).
    *
    * `dfCap` drops postings for shingles over-represented in EITHER side
    * (caps computed per side: a stop-shingle is hot in both). Surviving
    * pairs keep their true Jaccard — same conservative direction as
    * [[jaccardPairs]].
    *
    * @return (new_id, old_id, jaccard); anti-join `newDocs` on `new_id` to
    *         get the kept increment.
    */
  def jaccardPairsAgainst(newDocs: DataFrame, oldDocs: DataFrame,
                          idCol: String, textCol: String,
                          shingleN: Int, threshold: Double,
                          dfCap: Option[Long] = None): DataFrame = {
    def prep(docs: DataFrame) = graft.util.Caches.cache(docs
      .select(col(idCol).as("id"),
        TextFunctions.shingles(TextFunctions.tokens(col(textCol)), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)).toDF
    // Join keys are xxhash64 of the shingles — 8-byte longs through the
    // shuffle instead of UTF8 n-grams (same trade as jaccardPairs: exact
    // absent 2^-64 collisions).
    def postings(d: DataFrame) = {
      val inv = d.select(col("id"),
        explode(transform(col("sh"), s => xxhash64(s))).as("tok"))
      dfCap match {
        case Some(cap) =>
          val hot = inv.groupBy("tok").agg(count(lit(1)).as("__df"))
            .filter(col("__df") > cap).select("tok")
          inv.join(broadcast(hot), Seq("tok"), "left_anti")
        case None => inv
      }
    }
    val nd = prep(newDocs)
    val od = prep(oldDocs)
    val shared = postings(nd).as("x").join(postings(od).as("y"), Seq("tok"))
      .groupBy(col("x.id").as("new_id"), col("y.id").as("old_id"))
      .agg(count(lit(1)).as("inter"))
    shared
      .join(nd.select(col("id").as("new_id"), size(col("sh")).as("sz_a")), "new_id")
      .join(od.select(col("id").as("old_id"), size(col("sh")).as("sz_b")), "old_id")
      .withColumn("jaccard",
        col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("old_id"), col("jaccard"))
  }
}
