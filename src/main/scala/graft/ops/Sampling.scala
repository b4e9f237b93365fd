package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, key-stable sampling and dataset splits — the
  * training-data-pipeline operators that must NOT change membership when
  * the pipeline reruns or repartitions (unlike `df.sample`, whose output
  * depends on partitioning).
  *
  * Buckets come from the first 8 hex digits of md5(key): engine-portable
  * (md5 is identical everywhere, so splits can be re-derived by any system
  * downstream), uniform, and a pure projection — no shuffle, fully
  * pushdown-friendly at 100 TB.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the row key. */
  def deterministicBucket(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Rendezvous (highest-random-weight) shard assignment — Thaler &
    * Ravishankar 1996: `shard(key) = argmax_s h(key, s)`. The property
    * [[deterministicBucket]]'s mod-hash lacks: growing the shard count
    * S → S+1 moves ONLY the keys the new shard wins (expected fraction
    * 1/(S+1)), where mod-hashing moves nearly everything — the stable
    * routing primitive for incremental pipelines (stateful shards, cache
    * affinity, bucketed layouts that must survive re-sharding).
    *
    * `h(key, s)` is the seeded affine permutation of a PRE-HASHED key
    * column — pass [[graft.functions.TextFunctions.polyHash]] output, the
    * [[MinHashDedup.signaturePortable]] hash-once-permute-affinely
    * discipline (hashing inside the argmax would re-fold the key S
    * times). Engine-replayable (the D15 tier); argmax ties
    * (P-collisions, measure ~1/P) break toward the HIGHER shard id (the
    * max-struct order), documented and mirrored by the oracle. Pure
    * projection: no shuffle, pushdown-friendly.
    */
  def rendezvousShard(hashCol: Column, shards: Int): Column = {
    require(shards >= 1, s"rendezvousShard: shards must be >= 1, got $shards")
    val hs = MinHashDedup.perms(shards, seed = 53).zipWithIndex.map {
      case ((a, b), s) =>
        struct(pmod(hashCol * lit(a) + lit(b),
          lit(graft.functions.TextFunctions.PolyP)).as("h"),
          lit(s.toLong).as("shard"))
    }
    array_max(array(hs: _*)).getField("shard")
  }

  /** Keep a stable `fraction` of rows by key. */
  def sampleByKey(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(deterministicBucket(key, 1000000) < (fraction * 1000000).toLong)

  /** Label every row train/val/test by stable key bucket (per-mille). */
  def split(df: DataFrame, key: Column, trainPerMille: Int, valPerMille: Int,
            as: String = "split"): DataFrame = {
    val b = deterministicBucket(key, 1000)
    df.withColumn(as,
      when(b < trainPerMille, "train")
        .when(b < trainPerMille + valPerMille, "val")
        .otherwise("test"))
  }

  /** LEAKAGE-SAFE dataset split: [[split]] keyed by each document's
    * near-dup GROUP representative instead of its own id, so every member
    * of a near-duplicate cluster lands in the SAME split — the guard
    * against train/test leakage through paraphrases and boilerplate
    * copies, which a per-document split structurally cannot give (two
    * near-identical docs hash independently and straddle the boundary).
    * Docs in no group are their own singleton representative.
    *
    * Deterministic end to end: the group table is itself a pure function
    * of the data (connected components over the dedup pair set,
    * [[MinHashDedup.dupGroups]]) and the bucket is the md5 device every
    * split/sample in this file uses — same corpus, same split, any
    * partitioning, any engine.
    *
    * Scale shape: one left join of the corpus against the (much smaller)
    * group mapping, then a projection — the split itself adds no shuffle
    * beyond that join, and the join key is the doc id both sides.
    *
    * @param groups (id, component) — [[MinHashDedup.dupGroups]] output
    * @return df plus (group_rep, split)
    */
  def groupAwareSplit(df: DataFrame, idCol: String, groups: DataFrame,
                      trainPerMille: Int, valPerMille: Int): DataFrame = {
    val g = groups.select(col("id").as(idCol), col("component"))
    val joined = df.join(g, Seq(idCol), "left")
      .withColumn("group_rep",
        coalesce(col("component"), col(idCol).cast("long")))
      .drop("component")
    split(joined, col("group_rep"), trainPerMille, valPerMille)
  }

  /** Stratified deterministic sampling: keep a per-stratum fraction of rows,
    * selected by the same md5 key bucket as [[sampleByKey]] — so membership
    * is stable under reruns/repartitioning AND a row kept at fraction f stays
    * kept at any fraction ≥ f (nested samples, the property curriculum /
    * ablation pipelines need). Strata not in `fractions` fall back to
    * `default`. The whole operator is a single projection + filter — no
    * shuffle, pushdown-friendly; per-stratum row counts never influence
    * membership (unlike quota sampling, which needs a global count pass).
    */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       fractions: Map[String, Double],
                       default: Double = 0.0): DataFrame = {
    val b = deterministicBucket(key, 1000000)
    val threshold = fractions.foldLeft(lit((default * 1000000).toLong)) {
      case (acc, (k, f)) => when(stratum === k, lit((f * 1000000).toLong)).otherwise(acc)
    }
    df.filter(b < threshold)
  }

  /** Deterministic global shuffle — reproducible training-order
    * randomization: every row gets a (shard, pos) coordinate where `shard`
    * is its md5 bucket and `pos` its rank within the shard by md5 order.
    * Reading shards sequentially yields a pseudo-random document order
    * that is byte-stable across reruns and repartitioning (unlike
    * `orderBy(rand())`), so a resumed training job sees the identical
    * stream. Uncorrelated with any data column — md5 of the key is the
    * permutation.
    *
    * Scale shape: one hash shuffle by shard + per-shard sort; `shards`
    * bounds the per-task sort width (a single global sort would serialize
    * the corpus — same argument as [[packDocs]]), and raising it is the
    * scale knob.
    */
  def deterministicShuffle(df: DataFrame, key: Column, shards: Int): DataFrame = {
    val mk = md5(key.cast("string"))
    df.withColumn("shard", deterministicBucket(key, shards))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy(mk, key)).cast("long"))
  }

  /** Weighted sample WITHOUT replacement of `n` rows — inclusion odds
    * proportional to `weight` — via the Efraimidis–Spirakis exponential
    * race: each row draws priority −ln(u)/w from a uniform u and the n
    * SMALLEST priorities win (equivalent to sequential weighted draws
    * without replacement). u comes from the same md5-of-key uniform as
    * [[deterministicBucket]], so the sample is deterministic, rerun- and
    * repartition-stable, and re-derivable by any engine — the priority is
    * rounded to 9 dp so cross-engine libm jitter in ln() cannot flip an
    * ordering both engines agree on at that precision (ties break by key).
    *
    * Rows with non-positive weight or a null key are excluded (a null key
    * would yield md5(null)=null → a null priority, which Spark's ascending
    * sort puts FIRST — preempting real sample slots instead of never being
    * drawn; non-positive weight would never be drawn, and ANSI mode would
    * throw on the division).
    *
    * Scale shape: a pure projection + `orderBy(priority).limit(n)` =
    * `TakeOrderedAndProject` — each map task keeps its local top-n, the
    * driver merges O(tasks·n); no global sort of the corpus.
    *
    * @return the sampled rows + a `priority` column (ascending = picked
    *         first; useful for nested sub-samples: the top n' ≤ n rows are
    *         exactly the weighted sample of size n')
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     n: Int): DataFrame = {
    val u = (conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(0.5d)) / lit(4294967296.0d)
    df.filter(weight > 0 && key.isNotNull)
      .withColumn("priority", round(-log(u) / weight.cast("double"), 9))
      .orderBy(col("priority"), key)
      .limit(n)
  }

  /** Per-group weighted sample: the [[weightedSample]] race run
    * independently inside every `stratum` value, with the winners chosen
    * by the native bounded top-k aggregate ([[graft.functions.expressions.
    * TopKAgg]], score = −priority) — so the shuffle carries at most n
    * (id, priority) pairs per (stratum × map partition) instead of every
    * row, the per-group analog of `TakeOrderedAndProject`. Returns
    * (stratum, rnk, id, priority); join back on id for payload columns.
    */
  def weightedSamplePerKey(df: DataFrame, stratum: Column, key: Column,
                           weight: Column, n: Int): DataFrame = {
    val u = (conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(0.5d)) / lit(4294967296.0d)
    // TopKAgg already skips null scores, but filtering null keys here too
    // keeps the two contracts aligned with [[weightedSample]].
    df.filter(weight > 0 && key.isNotNull)
      .select(stratum.as("stratum"), key.as("id"),
        round(-log(u) / weight.cast("double"), 9).as("priority"))
      .groupBy("stratum")
      .agg(graft.functions.expressions.TopKAgg.topK(
        -col("priority"), col("id"), n).as("top"))
      .select(col("stratum"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("stratum"), (col("i") + 1).cast("int").as("rnk"),
        col("t.id").as("id"), (-col("t.score")).as("priority"))
  }

  /** Down-sample a corpus to a TOKEN budget with per-source mixture weights
    * — the "60% web, 30% code, 10% books, 500B tokens total" recipe every
    * training run starts from. Source `s` keeps a deterministic
    * ≈ `weights(s)·targetTokens`-token slice (capped at what it has;
    * weights absent from the map get `default`). Membership uses the same
    * md5 bucket as [[sampleByKey]], so samples are repartition-stable and
    * NEST across budgets: the 100B-token mix is a subset of the 500B mix —
    * what scaling-law ladders need.
    *
    * The per-source keep fraction is computed IN the plan from the
    * per-source token totals (one group-cardinality aggregate broadcast
    * back) — no driver collect, no config file that drifts from the data.
    * Budgeting is in expectation per doc (exact-budget packing is
    * [[packDocs]]' job downstream).
    */
  def mixToBudget(docs: DataFrame, sourceCol: String, idCol: String,
                  tokenCount: Column, weights: Map[String, Double],
                  targetTokens: Long, default: Double = 0.0): DataFrame = {
    val withTok = docs.withColumn("__tok", tokenCount.cast("long"))
    val totals = withTok.groupBy(col(sourceCol))
      .agg(sum(col("__tok")).as("__total"))
    val weightExpr = weights.foldLeft(lit(default)) {
      case (acc, (s, w)) => when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    // guard the empty-source division (ANSI throws on /0); frac ∈ [0, 1]
    val frac = when(col("__total") <= 0, lit(0.0))
      .otherwise(least(lit(1.0),
        weightExpr * lit(targetTokens.toDouble) / col("__total")))
    withTok.join(broadcast(totals), Seq(sourceCol))
      .filter(deterministicBucket(col(idCol), 1000000) < frac * lit(1000000.0))
      .drop("__total", "__tok")
  }

  /** Temperature-reweighted corpus mix — [[mixToBudget]]'s sibling where the
    * per-source weights are not handed in but DERIVED from the corpus:
    * `w_s ∝ totalTokens_s^alpha`, the multinomial temperature-sampling rule
    * multilingual training runs use to lift low-resource sources without
    * drowning the head (alpha = 1 keeps natural proportions; alpha → 0
    * equalizes all sources; XLM-R ships 0.3). Source `s` then keeps a
    * deterministic ≈ `w_s·targetTokens`-token slice, capped at what it has.
    *
    * Same machinery as [[mixToBudget]]: the md5-bucket membership is
    * repartition-stable and NESTS across budgets, and both the per-source
    * totals and the alpha-power normalization are computed IN the plan —
    * the power/sum runs on the per-source AGGREGATE (a handful of rows;
    * the single-partition normalization window never sees corpus rows),
    * then broadcasts back into the row-level filter. One corpus scan for
    * totals, one for membership; the corpus itself never shuffles.
    */
  def temperatureMix(docs: DataFrame, sourceCol: String, idCol: String,
                     tokenCount: Column, alpha: Double,
                     targetTokens: Long): DataFrame = {
    // a NULL source is unsampleable (the membership join can never match
    // null == null) — excluding such rows HERE keeps their alpha-weighted
    // mass out of the normalizer too, or every real source's share would
    // silently deflate (review fix)
    val withTok = docs.filter(col(sourceCol).isNotNull)
      .withColumn("__tok", tokenCount.cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val totals = withTok.groupBy(col(sourceCol))
      .agg(sum(col("__tok")).as("__total"))
      .withColumn("__pw", when(col("__total") <= 0, lit(0.0))
        .otherwise(pow(col("__total").cast("double"), lit(alpha))))
      .withColumn("__z", sum(col("__pw")).over(w))
    val frac = when(col("__total") <= 0 || col("__z") <= 0, lit(0.0))
      .otherwise(least(lit(1.0),
        col("__pw") / col("__z") * lit(targetTokens.toDouble) / col("__total")))
    withTok.join(broadcast(totals), Seq(sourceCol))
      .filter(deterministicBucket(col(idCol), 1000000) < frac * lit(1000000.0))
      .drop("__total", "__pw", "__z", "__tok")
  }

  /** Cap rows per key (domain quotas: "at most n documents per source/host",
    * the crawl-balancing rule that stops one giant domain from dominating a
    * training mix). Selection within a key is by md5-of-id — deterministic,
    * repartition-stable, and uncorrelated with any data column, i.e. a
    * uniform per-key subsample rather than "first n in storage order".
    *
    * Scale shape: one hash shuffle on the key + per-key sort (the same cost
    * as any keyed window). Keys at or under quota pass through unchanged;
    * there is no global count pass (unlike proportional quota schemes),
    * which is what lets the operator stream at corpus scale.
    */
  def quotaPerKey(df: DataFrame, keyCols: Seq[String], idCol: String,
                  n: Int): DataFrame =
    df.withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
          .orderBy(md5(col(idCol).cast("string")), col(idCol))))
      .filter(col("__rk") <= n)
      .drop("__rk")

  /** Pack documents into ~`seqLen`-token training sequences: within a shard
    * (id mod `shards` — deterministic and engine-portable), docs are taken
    * in id order and a doc starts the pack its PREDECESSORS' cumulative
    * token count falls in — the streaming greedy-fill rule, expressed as a
    * running-sum window, so a pack holds consecutive docs and overflows by
    * at most one document past the budget.
    *
    * Scale shape: the running sum partitions by shard — `shards` bounds the
    * per-task sort, and raising it is the scale knob (a GLOBAL order-by
    * cumsum would serialize the corpus through one partition). Packing is
    * deterministic given (ids, token counts), so reruns assign identical
    * sequences — the property checkpoint-resumable training jobs need.
    *
    * @return one row per doc: (idCol, shard, pack_id, n_tokens)
    */
  def packDocs(docs: DataFrame, idCol: String, tokenCount: Column,
               seqLen: Int, shards: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs.select(col(idCol), tokenCount.cast("long").as("n_tokens"),
        pmod(col(idCol), lit(shards.toLong)).as("shard"))
      .withColumn("pack_id",
        ((sum(col("n_tokens")).over(w) - col("n_tokens")) / seqLen).cast("long"))
      .select(col(idCol), col("shard"), col("pack_id"), col("n_tokens"))
  }

  /** Capacity accounting for [[packDocs]] output — per shard: pack and
    * doc counts, token sum, min/max pack length, the straddle OVERFLOW
    * beyond the budget, and the fill ratio vs `n_packs · seqLen`.
    * Straddle assignment (a doc belongs to the pack where its running
    * sum STARTS) means a pack can exceed `seqLen` by one doc's tail —
    * this is the metric that prices that choice (rising overflow ⇒
    * split or truncate straddling docs upstream). Two map-side-
    * combinable aggregates; the second runs at shard grain (bounded).
    *
    * CONTRACT: `seqLen` must be the SAME budget the frame was packed
    * with — [[packDocs]] does not carry it, so a mismatched value here
    * yields plausible-looking but wrong overflow/fill numbers (the
    * pack_id boundaries were drawn at the other budget).
    */
  def packStats(packed: DataFrame, seqLen: Int): DataFrame =
    packed.groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_len"))
      .groupBy("shard").agg(
        count(lit(1)).as("n_packs"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("pack_len")).as("sum_tokens"),
        min(col("pack_len")).as("min_pack_len"),
        max(col("pack_len")).as("max_pack_len"),
        sum(when(col("pack_len") > seqLen,
          col("pack_len") - seqLen).otherwise(lit(0L)))
          .as("overflow_tokens"),
        floor(sum(col("pack_len")).cast("double") /
            (count(lit(1)) * lit(seqLen.toLong)).cast("double") *
            lit(1e6) + lit(0.5))
          .cast("long").as("fill_micro"))
}
