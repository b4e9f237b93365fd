package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.MisraGries

/** Heavy hitters: items appearing more than n/k times (the classic
  * φ = 1/k frequent-items threshold; reference analog: the category/
  * status frequency reports of transform.py's groupby counts).
  *
  * Two tiers, same contract as the percentile pair (exact `percentile` /
  * `approx_percentile`):
  *  - [[heavyHitters]] — EXACT: one hash aggregate over distinct items.
  *    The shuffle carries one row per distinct item; right whenever the
  *    distinct set is bounded (languages, event types, status codes).
  *  - [[heavyHittersSketched]] — O(capacity) aggregation state regardless
  *    of item cardinality: a Misra–Gries sketch nominates ≤ capacity
  *    candidates (guaranteed superset of the true heavy hitters when
  *    capacity ≥ k − 1), then one exact counting pass restricted to those
  *    candidates (broadcast semi filter — the shuffle carries ≤ capacity
  *    keys) verifies counts against the threshold. Output is therefore
  *    EXACTLY [[heavyHitters]]' — sketch in the plan, no sketch error in
  *    the answer — which is what makes it oracle-checkable (q131) even
  *    though the sketch itself is order-dependent.
  */
object Frequency {

  /** Exact heavy hitters: items of `itemCol` with count · k > n (strict,
    * nulls excluded). Returns (item, cnt).
    *
    * Single corpus scan: the total n comes from an empty-frame window SUM
    * over the per-item counts — a one-partition pass over O(distinct
    * items) POST-AGGREGATE rows, which is this tier's stated bound (a
    * second corpus scan, the join-with-scalar-total alternative, loses to
    * that whenever the corpus dwarfs the distinct set — and column
    * pruning breaks exchange reuse between the two scans, so the "free"
    * shared subtree is not actually free).
    *
    * CARDINALITY GUIDANCE: both the shuffle (one row per distinct item)
    * and the single-partition total-n window are O(distinct). Past ~10⁶
    * distinct items (URLs, user agents, n-grams) switch to
    * [[heavyHittersSketched]], whose state is O(capacity) regardless of
    * cardinality and whose output is still exact.
    */
  /** Burstiness (Fano factor) of per-key activity over calendar buckets:
    * `variance / mean` of the key's per-bucket counts — the dispersion
    * diagnostic that separates steady activity (≈1, Poisson-like) from
    * bursts (≫1) and metronomes (≈0); the classic bot/scraper screen on
    * an event log, and a data-quality probe on ingest volume.
    *
    * Exact integer core: per-bucket counts, then n·Q − S² and n·S
    * (n = buckets, S = Σc, Q = Σc²) stay in longs, so the Fano factor
    * is a single double division of two exact operands — emitted as
    * `floor(x·1e6 + 0.5)` micro-units, hash-stable across engines.
    * Keys seen in exactly one bucket have zero variance by construction
    * (fano 0), never a division hazard (S ≥ 1 whenever the key exists).
    *
    * Scale shape: two map-side-combinable aggregations (events → bucket
    * counts → key moments); nothing else.
    *
    * @param bucket the calendar bucket column (e.g. `to_date(ts)`)
    * @return (keys…, n_buckets, n_events, fano_micro)
    */
  def burstiness(df: DataFrame, keys: Seq[String],
                 bucket: Column): DataFrame = {
    val counts = df.groupBy((keys.map(col) :+ bucket.as("__b")): _*)
      .agg(count(lit(1)).as("__c"))
    counts.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("__c")).as("__s"),
        sum(col("__c") * col("__c")).as("__q"))
      .select((keys.map(col) ++ Seq(
        col("n_buckets"),
        col("__s").as("n_events"),
        floor((col("n_buckets") * col("__q") - col("__s") * col("__s"))
            .cast("double") * lit(1000000.0) /
            (col("n_buckets") * col("__s")).cast("double") + lit(0.5))
          .cast("long").as("fano_micro"))): _*)
  }

  def heavyHitters(df: DataFrame, itemCol: Column, k: Int): DataFrame = {
    require(k >= 2, s"heavyHitters: k must be >= 2, got $k")
    df.select(itemCol.as("item")).filter(col("item").isNotNull)
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .withColumn("__n", sum(col("cnt")).over(Window.partitionBy()))
      .filter(col("cnt") * k > col("__n"))
      .select(col("item"), col("cnt"))
  }

  /** Per-group exact heavy hitters: [[heavyHitters]] run independently
    * inside every `groupCols` tuple (items of `itemCol` with
    * count · k > n(group), strict, nulls excluded). Returns
    * (groupCols…, item, cnt). The total-n window is PARTITIONED by group —
    * O(distinct items per group) post-aggregate rows per partition, no
    * single-partition stage; the same cardinality guidance as the global
    * tier applies per group.
    */
  def heavyHittersByKey(df: DataFrame, groupCols: Seq[String], itemCol: Column,
                        k: Int): DataFrame = {
    require(k >= 2, s"heavyHittersByKey: k must be >= 2, got $k")
    df.select(groupCols.map(col) :+ itemCol.as("item"): _*)
      .filter(col("item").isNotNull)
      .groupBy(groupCols.map(col) :+ col("item"): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("__n",
        sum(col("cnt")).over(Window.partitionBy(groupCols.map(col): _*)))
      .filter(col("cnt") * k > col("__n"))
      .select(groupCols.map(col) ++ Seq(col("item"), col("cnt")): _*)
  }

  /** Per-group candidates-then-verify heavy hitters — the per-language /
    * per-domain corpus-stats query a training-data pipeline actually runs
    * (tokens per language, URLs per crawl, user agents per day): one MG
    * sketch PER GROUP (O(capacity) state per group regardless of item
    * cardinality), then one exact verify pass where non-candidates
    * collapse into each group's null-item row so per-item counts and the
    * per-group total n come from the same aggregate. Output is EXACTLY
    * [[heavyHittersByKey]]'s — oracle-checkable (q140) despite the
    * order-dependent sketch, same contract as the global pair.
    */
  def heavyHittersSketchedByKey(df: DataFrame, groupCols: Seq[String],
                                itemCol: Column, k: Int,
                                capacity: Int): DataFrame = {
    require(k >= 2, s"heavyHittersSketchedByKey: k must be >= 2, got $k")
    require(capacity >= k - 1,
      s"heavyHittersSketchedByKey: capacity $capacity < k-1 loses the superset guarantee")
    val items = df.select(groupCols.map(col) :+ itemCol.as("item"): _*)
      .filter(col("item").isNotNull)
    val candidates = items
      .groupBy(groupCols.map(col): _*)
      .agg(MisraGries.mgTopK(col("item"), capacity).as("sketch"))
      .select(groupCols.map(col) :+ explode(col("sketch")).as("e"): _*)
      .select(groupCols.map(col) :+ col("e").getField("item").as("item"): _*)
      .withColumn("__cand", lit(true))
    val grouped = items
      .join(broadcast(candidates), groupCols :+ "item", "left")
      .groupBy(groupCols.map(col) :+
        when(col("__cand"), col("item")).as("item"): _*)
      .agg(count(lit(1)).as("cnt"))
    grouped
      .withColumn("__n",
        sum(col("cnt")).over(Window.partitionBy(groupCols.map(col): _*)))
      .filter(col("item").isNotNull && col("cnt") * k > col("__n"))
      .select(groupCols.map(col) ++ Seq(col("item"), col("cnt")): _*)
  }

  /** Candidates-then-verify heavy hitters; see object doc. Two corpus
    * scans by construction (nominate, then verify); the verify shuffle
    * carries one row per (candidate × map partition) — non-candidates
    * fold into a single null-item group per partition that exists only to
    * make the exact total come out of the same pass. `capacity` must be
    * ≥ k − 1 for the superset guarantee (use several × k so the MG error
    * n/(capacity+1) stays well under the n/k threshold).
    */
  def heavyHittersSketched(df: DataFrame, itemCol: Column, k: Int,
                           capacity: Int): DataFrame = {
    require(k >= 2, s"heavyHittersSketched: k must be >= 2, got $k")
    require(capacity >= k - 1,
      s"heavyHittersSketched: capacity $capacity < k-1 loses the superset guarantee")
    val items = df.select(itemCol.as("item")).filter(col("item").isNotNull)
    val candidates = items
      .agg(MisraGries.mgTopK(col("item"), capacity).as("sketch"))
      .select(explode(col("sketch")).as("e"))
      .select(col("e").getField("item").as("item"))
      .withColumn("__cand", lit(true))
    // one verify pass: candidate rows keep their item, the rest collapse
    // into the null group — so per-item exact counts AND the exact total
    // n (= sum over all groups) come from the same aggregate
    val grouped = items
      .join(broadcast(candidates), Seq("item"), "left")
      .groupBy(when(col("__cand"), col("item")).as("item"))
      .agg(count(lit(1)).as("cnt"))
    grouped
      .withColumn("__n", sum(col("cnt")).over(Window.partitionBy()))
      .filter(col("item").isNotNull && col("cnt") * k > col("__n"))
      .select(col("item"), col("cnt"))
  }

  private val Dec0 =
    org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)

  /** Gini concentration of a non-negative integer measure across groups:
    * `G = Σ_i (2i − n − 1)·x_(i) / (n·Σx)` over the ascending-sorted
    * group values — the data-balance readout (0 = perfectly even mix,
    * →1 = one group holds everything) for source/language/label shares
    * before a training mix is frozen. Input is the GROUP-grain count
    * table (one corpus aggregate upstream), so the sort is over groups —
    * the bounded-groups contract (sources and languages number in the
    * thousands, not the corpus); the weighted sum forms in exact DECIMAL
    * (rank·count products pass Long at 100 TB token masses), ONE double
    * division, micro-quantized. All-zero mass reports NULL, never 0.
    *
    * @param grouped (groupCol?, measureCol) — one row per group
    * @return one row: (n_groups, total, gini_micro)
    */
  def gini(grouped: DataFrame, measureCol: String): DataFrame = {
    val x = col(measureCol).cast("long")
    val w = Window.orderBy(x, monotonically_increasing_id())
    val ranked = grouped.filter(x.isNotNull && x >= 0)
      .withColumn("__r", row_number().over(w).cast("long"))
    ranked
      .agg(count(lit(1)).as("n_groups"), sum(x).as("total"),
        sum((lit(2).cast(Dec0) * col("__r").cast(Dec0) -
          lit(1).cast(Dec0)) * x.cast(Dec0)).as("__m"))
      // Σ(2i−n−1)x = Σ(2i−1)x − n·Σx: the numerator SUBTRACTS two
      // near-equal exacts — form it in DECIMAL (the olsTrend
      // cancellation lesson), divide once in double
      .select(col("n_groups"), col("total"),
        floor(when(col("total") === 0, lit(null)).otherwise(
          (col("__m") - col("n_groups").cast(Dec0) * col("total").cast(Dec0))
            .cast("double")
            / (col("n_groups").cast("double") * col("total").cast("double")))
          * lit(1000000.0) + lit(0.5)).cast("long").as("gini_micro"))
  }

  /** Heaps'-law fit of vocabulary growth: `V(n) ≈ K·n^β` — how fast the
    * distinct-token count grows with corpus size, T34's companion (Zipf
    * describes the frequency profile, Heaps the vocabulary's scaling; a
    * β far from the 0.4–0.6 natural-language band flags templated or
    * truncated corpora, β ≈ 1 flags near-unique noise/IDs).
    *
    * Exact growth curve WITHOUT a running-distinct scan: each token's
    * FIRST-occurrence position (min over the doc-rank of its carriers —
    * one token-grain aggregate), then `V(n) = #{tokens: first ≤ n}`
    * evaluated at geometric checkpoints n = 2, 4, …, N via one bounded
    * join; the ln–ln OLS reuses the nano-quantized exact-moment core.
    * Doc rank = position in `orderCol` order (ties broken by the column
    * itself — pass a unique id).
    *
    * Scale shape (r16): the doc rank is SHARD-BOUNDED — no corpus-grain
    * single-partition window. [[shardedRank]] range-buckets `orderCol`
    * into equal-width shards (pure arithmetic on a broadcast min/max
    * row — no sampled RangePartitioner, so the shard of a row is a pure
    * function of its value and the result replays on any engine), ranks
    * within shards in parallel, and composes global ranks from broadcast
    * per-shard offsets. The only unpartitioned window left runs over the
    * ≤`shards`-row offset table (the bounded-grain class). Everything
    * after is token-grain aggregates and a |checkpoints|-row fit.
    *
    * `orderCol` must be NUMERIC and unique (the doc-id contract the
    * ranking always had — ties now additionally land in one shard, where
    * the global sort's intra-tie order was engine-chosen).
    *
    * @return one row: (n_docs, n_checkpoints, beta_micro, r2_micro)
    */
  /** Global 1-based rank of `orderCol` (numeric, unique by contract)
    * WITHOUT a single-partition corpus window: equal-width range shards
    * from one broadcast (min, max) row — shard-of-row is pure arithmetic,
    * deterministic on any engine and any partitioning (no sampled
    * RangePartitioner bounds) — then per-shard `row_number` in parallel
    * and one bounded offsets table (≤ `shards` rows; ITS cumulative
    * window is the bounded-grain class) broadcast back. Rank values are
    * identical to `row_number() OVER (ORDER BY orderCol)` because shards
    * are range-contiguous. Equal-width sharding concentrates skewed id
    * distributions; ids are uniform-ish by construction in every caller
    * (the `deterministicShuffle` discipline), and AQE splits stragglers.
    *
    * @return the input plus `__r` (long, 1-based)
    */
  private def shardedRank(df: DataFrame, orderCol: String,
                          shards: Int = 64): DataFrame = {
    // fail LOUDLY on a non-numeric order column: a silent cast-to-long
    // would NULL every shard key and the offsets equi-join would drop
    // the whole corpus (empty fit, no error) — the pre-r16 global
    // window accepted any orderable type, so the narrowing must be told
    df.schema(orderCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case other => throw new IllegalArgumentException(
        s"shardedRank: orderCol '$orderCol' must be numeric (shard " +
          s"arithmetic), got ${other.catalogString} — pass a numeric " +
          "unique id")
    }
    val v = col(orderCol).cast("long")
    val bounds = df.agg(min(v).as("__lo"), max(v).as("__hi"))
    // width = floor((hi−lo)/S) + 1 in EXACT decimal (ids may exceed the
    // 2^53 double grid). Subtract in DECIMAL too: a long-first (hi − lo)
    // wraps silently in non-ANSI mode when the id span crosses 2^63
    // (ids near both Long.MinValue and Long.MaxValue), which would mint
    // wrong shards and wrong global ranks (ADVICE r16)
    val width = floor((col("__hi").cast(Dec0) - col("__lo").cast(Dec0)) /
      lit(shards).cast(Dec0)).cast(Dec0) + lit(1).cast(Dec0)
    val sharded = df.crossJoin(broadcast(bounds))
      .withColumn("__shard",
        floor((v.cast(Dec0) - col("__lo").cast(Dec0)) / width).cast("int"))
      .drop("__lo", "__hi")
    val local = sharded.withColumn("__lr", row_number().over(
      Window.partitionBy(col("__shard")).orderBy(col(orderCol))).cast("long"))
    val offsets = local.groupBy(col("__shard")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(
        Window.orderBy(col("__shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__shard"), col("__off"))
    local.join(broadcast(offsets), Seq("__shard"))
      .withColumn("__r", col("__off") + col("__lr"))
      .drop("__shard", "__lr", "__off")
  }

  def heapsFit(docs: DataFrame, orderCol: String, textCol: String): DataFrame = {
    val ranked = shardedRank(
      docs.filter(col(textCol).isNotNull && col(orderCol).isNotNull),
      orderCol)
    val firstSeen = ranked
      .select(col("__r"), explode(graft.functions.TextFunctions
        .tokens(col(textCol))).as("__tok"))
      .groupBy("__tok").agg(min(col("__r")).as("__first"))
    val nDocs = ranked.agg(max(col("__r")).as("__n"))
    // geometric checkpoints 2, 4, … up to the doc count (bounded: ~log₂ N
    // rows) — built from the one-row total, joined at token grain once
    val checkpoints = nDocs.select(explode(sequence(lit(1),
        greatest(floor(log2(col("__n").cast("double"))).cast("int"),
          lit(1)))).as("__k"), col("__n"))
      .select(least(pow(lit(2.0), col("__k")).cast("long"), col("__n"))
        .as("__cp"))
      .unionByName(nDocs.select(col("__n").as("__cp")))
      .distinct()
    val growth = firstSeen.crossJoin(broadcast(checkpoints))
      .filter(col("__first") <= col("__cp"))
      .groupBy(col("__cp")).agg(count(lit(1)).as("__v"))
    def nano(c: Column) = floor(c * lit(1e9) + lit(0.5)).cast("long")
    val xy = growth.select(
      nano(log(col("__cp").cast("double"))).cast(Dec0).as("__x"),
      nano(log(col("__v").cast("double"))).cast(Dec0).as("__y"))
    val agg = xy.agg(count(lit(1)).as("n_checkpoints"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"))
    val nD = col("n_checkpoints").cast(Dec0)
    def d(c: Column) = c.cast("double")
    val dxx = nD * col("__sxx") - col("__sx") * col("__sx")
    val dyy = nD * col("__syy") - col("__sy") * col("__sy")
    val num = nD * col("__sxy") - col("__sx") * col("__sy")
    val beta = when(dxx === 0, lit(null)).otherwise(d(num) / d(dxx))
    val r2 = when(dxx === 0 || dyy === 0, lit(null))
      .otherwise(d(num) * d(num) / (d(dxx) * d(dyy)))
    agg.crossJoin(broadcast(nDocs))
      .select(col("__n").as("n_docs"), col("n_checkpoints"),
        floor(beta * lit(1000000.0) + lit(0.5)).cast("long").as("beta_micro"),
        floor(r2 * lit(1000000.0) + lit(0.5)).cast("long").as("r2_micro"))
  }

  /** Zipf-law fit of a frequency table: OLS of `ln(count)` on `ln(rank)`
    * over the top `topN` items — the corpus-health readout (natural
    * language sits near α ≈ 1; α far off flags templated/boilerplate or
    * deduplication-starved corpora; R² far below 1 flags a broken
    * tokenizer). Returns α = −slope with the fit quality.
    *
    * Rank = count-desc, item-asc over the top-N cut
    * (TakeOrderedAndProject — no global sort); the N-row window after is
    * bounded by construction. ln values NANO-quantize to longs BEFORE
    * the moment sums (commuting integers — the psiDrift discipline),
    * moments and discriminants form in exact DECIMAL over those longs
    * (the olsTrend cancellation lesson), two divisions out.
    *
    * @param counts (itemCol, countCol) — item-grain frequency table
    * @return one row: (n_fit, alpha_micro, r2_micro)
    */
  def zipfFit(counts: DataFrame, itemCol: String, countCol: String,
              topN: Int = 200): DataFrame = {
    require(topN >= 3, s"zipfFit: topN must be >= 3, got $topN")
    val top = counts
      .filter(col(countCol).isNotNull && col(countCol) > 0)
      .orderBy(col(countCol).desc, col(itemCol))
      .limit(topN)
    val w = Window.orderBy(col(countCol).desc, col(itemCol))
    def nano(c: Column) = floor(c * lit(1e9) + lit(0.5)).cast("long")
    val xy = top.withColumn("__rank", row_number().over(w).cast("long"))
      .select(nano(log(col("__rank").cast("double"))).cast(Dec0).as("__x"),
        nano(log(col(countCol).cast("double"))).cast(Dec0).as("__y"))
    val agg = xy.agg(count(lit(1)).as("n_fit"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"))
    val nD = col("n_fit").cast(Dec0)
    def d(c: Column) = c.cast("double")
    val dxx = nD * col("__sxx") - col("__sx") * col("__sx")
    val dyy = nD * col("__syy") - col("__sy") * col("__sy")
    val num = nD * col("__sxy") - col("__sx") * col("__sy")
    val slope = when(dxx === 0, lit(null)).otherwise(d(num) / d(dxx))
    val r2 = when(dxx === 0 || dyy === 0, lit(null))
      .otherwise(d(num) * d(num) / (d(dxx) * d(dyy)))
    agg.select(col("n_fit"),
      floor(-slope * lit(1000000.0) + lit(0.5)).cast("long").as("alpha_micro"),
      floor(r2 * lit(1000000.0) + lit(0.5)).cast("long").as("r2_micro"))
  }
}
