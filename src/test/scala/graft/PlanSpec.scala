package graft

/** Plan-shape regression tests — the properties SCALE.md claims, asserted
  * so they can't silently regress: predicate pushdown, column pruning,
  * broadcast star joins, single-shuffle aggregation, codegen coverage.
  */
class PlanSpec extends SparkSpec {

  /** Final (post-AQE) plan section only. Execute the df's own plan first
    * (count() would plan a different query), then cut at the Initial Plan
    * echo — AQE prints both.
    */
  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf())
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def countOf(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("q01: filter pushed to parquet scan, unused columns pruned") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
    assert(!p.contains("l_partkey"), "pruned column must not be read")
    assert(p.contains("*(1)"), "scan stage must be whole-stage codegen")
  }

  test("q01: exactly one shuffle (map-side partial aggregation)") {
    val p = plan("q01_pricing_summary")
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
    assert(p.contains("partial_sum"))
  }

  test("q05: star join is a broadcast chain, single shuffle for the agg") {
    val p = plan("q05_regional_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "dims must broadcast, not SMJ")
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
  }

  test("q02: multi-predicate filter reaches the scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters"))
    assert(p.contains("l_discount") && p.contains("l_quantity"))
  }

  test("q37: plan contains the native dot product expression") {
    val p = plan("q37_cosine_topk")
    assert(p.toLowerCase.contains("dotproduct"), p.take(800))
  }

  test("AQE re-plans at runtime (coalesced shuffle read in the final plan)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("AQEShuffleRead"), p.take(600))
  }

  test("q39/q63/q74: pair generation never BroadcastNestedLoops") {
    for (q <- Seq("q39_vector_neardup", "q74_vector_neardup_lsh",
        "q63_text_embed_neardup")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoop"),
        s"$q must generate pairs via blocked/bucketed equi-joins\n${p.take(1200)}")
      graft.util.Caches.releaseAll()
    }
  }

  test("q38: one corpus scan — all LSH tables bucket in a single pass") {
    val p = plan("q38_lsh_ann")
    // corpus side + broadcast query side = exactly 2 scans; the old
    // formulation rescanned the corpus once per hash table (6 + 6 at q38's
    // knobs) and was the round-6 bench regression
    assert(countOf(p, "Scan parquet") == 2, p.take(1500))
    assert(p.contains("HyperplaneBuckets") || p.toLowerCase.contains("hyperplane"),
      s"buckets must come from the native single-pass expression\n${p.take(800)}")
  }

  test("q86: bloom membership probe prunes the fact side before the join") {
    val p = plan("q86_bloom_pruned_join")
    assert(p.contains("might_contain") || p.contains("BloomFilterMightContain"),
      s"fact scan must be bloom-filtered\n${p.take(1200)}")
  }

  test("q52: revenue CTE computed once (window max, not scalar-subquery rescan)") {
    val p = plan("q52_top_supplier")
    // one lineitem scan + one supplier scan; the old scalar-subquery form
    // scanned lineitem twice
    assert(countOf(p, "Scan parquet") == 2, p.take(1500))
  }

  test("q73: the salted key participates in the join") {
    val p = plan("q73_salted_join")
    assert(p.contains("__salt"), p.take(1200))
  }

  test("q79: the probe table broadcasts — the corpus never shuffles by cell") {
    // r6→r7 bench noise moved q79 5× with zero code change; this pins plan
    // health independent of timing. The ONLY corpus exchange allowed is the
    // assignment window's hashpartitioning(vec_id); an exchange keyed by
    // centroid_id would mean the cell join shuffled the corpus — the exact
    // regression the broadcast(probes) hint exists to prevent.
    val p = plan("q79_ivf_search")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), "cell join must not shuffle the corpus")
    assert(!p.contains("hashpartitioning(centroid_id"),
      s"corpus must never be exchanged by cell id\n${p.take(1500)}")
  }

  test("q89: the fence table broadcasts — the fact table is never shuffled for tagging") {
    val p = plan("q89_iqr_outliers")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      "per-group fences are group-cardinality-sized; tagging must broadcast them")
  }

  test("q95: the matched-id set broadcasts into the keep-set anti-join") {
    val p = plan("q95_kept_increment")
    assert(p.contains("BroadcastHashJoin LeftAnti") || (p.contains("LeftAnti") &&
      p.contains("BroadcastHashJoin")),
      s"matched ids are increment-bounded and must broadcast\n${p.take(1200)}")
    graft.util.Caches.releaseAll()
  }

  test("q96: corpus tokenized once — model and scoring share the cached bigrams") {
    // Each InMemoryRelation echo prints its provenance "Scan parquet" line,
    // so scan-count is not meaningful here; the property is that BOTH the
    // model aggregate and the scoring join consume the cache (the actual
    // tokenize+explode runs once, at materialization).
    val p = plan("q96_lm_score")
    assert(countOf(p, "InMemoryTableScan") >= 2,
      s"model and scoring must both read the cached bigram projection\n${p.take(1200)}")
    graft.util.Caches.releaseAll()
  }

  test("q101: the boilerplate hot set broadcasts into the line prune") {
    val p = plan("q101_boilerplate_lines")
    assert(p.contains("LeftAnti") && p.contains("BroadcastHashJoin"),
      s"hot lines are few by definition and must broadcast\n${p.take(1200)}")
  }

  test("q36: posting self-join reuses one exchange for both sides") {
    // At toy scale the planner rightly broadcasts one side (no exchange to
    // reuse); disable auto-broadcast to assert the at-scale SMJ shape.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p = plan("q36_ngram_jaccard")
      assert(p.contains("ReusedExchange"),
        s"self-join sides are identical plans and must share the shuffle\n${p.take(1500)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      graft.util.Caches.releaseAll()
    }
  }

  test("q109: profile never plans an Expand (per-column passes, not multi-distinct)") {
    val p = plan("q109_profile")
    assert(!p.contains("Expand"), p.take(1200))
  }

  test("q107/q108: all indicator windows share ONE exchange + sort per key") {
    for (q <- Seq("q107_bollinger", "q108_rsi")) {
      val p = plan(q)
      assert(countOf(p, "Exchange hashpartitioning") == 1, s"$q:\n${p.take(1200)}")
      assert(countOf(p, "Exchange rangepartitioning") == 0, q)
    }
  }

  test("q112: grid band join is an equi-join, never a nested loop") {
    val p = plan("q112_band_join_grid")
    assert(!p.contains("NestedLoop"), p.take(1200))
  }

  test("q113: interval join is an equi-join with no distinct dedup pass") {
    val p = plan("q113_interval_join")
    assert(!p.contains("NestedLoop"), p.take(1200))
    // canonical-cell filter replaces dedup: exactly the join + agg-free plan
    assert(!p.toLowerCase.contains("deduplicate"), p.take(1200))
  }

  test("q124/q125: tick-window operators shuffle once per key grouping") {
    for ((q, maxEx) <- Seq(("q124_twap", 2), ("q125_underwater", 3))) {
      val p = plan(q)
      assert(countOf(p, "Exchange hashpartitioning") <= maxEx,
        s"$q:\n${p.take(1500)}")
      assert(countOf(p, "Exchange rangepartitioning") == 0, q)
    }
  }

  test("q127/q129: top_k aggregates partially on the map side") {
    // the aggregate's entire scale claim: the shuffle carries k-capped
    // partial buffers per (group × map partition), never the raw rows
    for (q <- Seq("q127_native_topk", "q129_topk_typed")) {
      val p = plan(q)
      assert(p.contains("partial_top_k"), s"$q must partial-aggregate:\n${p.take(1200)}")
      assert(!p.contains("RowNumber") && !p.contains("row_number"),
        s"$q must not fall back to the window form")
    }
  }

  test("q122: topPaths global top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("q122_top_paths")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    // the only window runs AFTER the limit, over ≤k rows — no full-table
    // single-partition exchange may exist upstream of the limit
    assert(countOf(p, "Exchange rangepartitioning") == 0, p.take(1500))
  }

  test("q130: exact heavy hitters scans the corpus ONCE") {
    // the total-n window must ride the aggregated counts, never trigger a
    // second corpus scan (exchange reuse between twin scans is broken by
    // column pruning — the reason the operator uses the window shape)
    val p = plan("q130_heavy_hitters")
    assert(countOf(p, "Scan parquet") == 1, p.take(1500))
    assert(countOf(p, "Exchange hashpartitioning") == 1, p.take(1500))
  }

  test("q132: weighted sample is TakeOrderedAndProject, no global sort") {
    val p = plan("q132_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(countOf(p, "Exchange rangepartitioning") == 0, p.take(1500))
  }

  test("q133: per-key weighted sample partial-aggregates on the map side") {
    val p = plan("q133_weighted_sample_per_key")
    assert(p.contains("partial_top_k"), p.take(1500))
    assert(!p.contains("RowNumber") && !p.contains("row_number"),
      "per-key sample must use the bounded aggregate, not a window")
  }

  test("q134: table digest is one scan, one map-side-combined shuffle") {
    val p = plan("q134_table_digest")
    assert(countOf(p, "Scan parquet") == 1, p.take(1500))
    assert(countOf(p, "Exchange hashpartitioning") == 1, p.take(1500))
    assert(p.contains("partial_sum"),
      "digest sum must combine on the map side — the full-table pass " +
        "shuffles one row per group, never per input row")
  }

  test("q140: per-group sketch partial-aggregates map-side; verify join broadcasts") {
    val p = plan("q140_heavy_hitters_by_lang")
    // the MG sketch must combine on the map side (the whole point: the
    // shuffle carries one O(capacity) sketch per group × partition, not
    // one row per token)...
    assert(p.contains("partial_mg_topk"), p.take(2000))
    // ...and the ≤capacity-per-group candidate set must broadcast into the
    // verify pass, never shuffle the token stream for a sort-merge join
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q104/q137: EMA series runs through the native linear scan, not a HOF fold") {
    for (q <- Seq("q104_ema", "q137_macd")) {
      val p = plan(q)
      assert(p.toLowerCase.contains("ema_scan"), s"$q: ${p.take(1200)}")
      assert(!p.toLowerCase.contains("aggregate(lambda"),
        s"$q must not fall back to the quadratic HOF fold")
    }
  }

  test("q149: SemDeDup assignment broadcasts centroids; compare is a cell equi-join") {
    val p = plan("q149_semantic_dedup")
    // the argmin assignment broadcasts the tiny centroid table (the corpus
    // never shuffles to cluster)...
    assert(p.contains("BroadcastNestedLoopJoin") ||
      countOf(p, "BroadcastExchange") >= 1, p.take(2000))
    // ...and the quadratic compare is confined by an equi-join on the cell
    // id — a shuffled hash/sort join keyed on centroid_id, never an
    // unkeyed cartesian of the corpus with itself
    assert(p.contains("centroid_id"), p.take(2000))
    assert(countOf(p, "CartesianProduct") == 0, p.take(2000))
  }

  test("q151: temperature mix broadcasts the per-source fractions; corpus never shuffles") {
    val p = plan("q151_temperature_mix")
    // the per-lang totals + alpha normalization land row-side via a
    // broadcast join; the membership filter runs in the corpus scan stage
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q157: substring dedup shuffles hashes, not text — two exchanges total") {
    val p = plan("q157_substring_dedup")
    // one exchange on the 64-bit gram hash (the count aggregate and the
    // positions join share it), one on doc_id (both windows and the final
    // per-doc aggregate share it); the gram text itself never shuffles
    assert(countOf(p, "Exchange hashpartitioning") == 2, p)
    assert(p.contains("xxhash64"), "grams must travel as 64-bit hashes")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"))
  }

  test("q160/q161: PQ encode is projection-only; queries broadcast; codes join, floats don't") {
    val p160 = plan("q160_pq_ann")
    // the query set broadcasts into the coded corpus — the corpus never
    // shuffles, and no shuffle exists before the per-query rank window
    assert(p160.contains("BroadcastExchange"), p160)
    assert(countOf(p160, "Exchange hashpartitioning") == 1, p160) // rank window only
    val p161 = plan("q161_ivfpq_ann")
    assert(!p161.contains("CartesianProduct"))
    // cell routing + probes are broadcast joins; the corpus side never
    // hash-shuffles except for its rank windows
    assert(p161.contains("BroadcastExchange"), p161)
  }

  test("q155: BM25 term stats broadcast; the top-k cut is TakeOrderedAndProject") {
    val p = plan("q155_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must never be a global sort: " + p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q167: residual IVF-PQ keeps the codes-only broadcast shape (r11)") {
    val p = plan("q167_ivfpq_residual")
    // residual subtraction + encode are projection-only over the routed
    // corpus; probes (with their q·c terms) broadcast — the corpus never
    // hash-shuffles except for its rank window, and nothing is a cartesian
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastExchange"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q168: batch BM25 cuts per query via map-side top_k, never a window sort (r11)") {
    val p = plan("q168_bm25_batch")
    // the per-query cut must be the bounded native aggregate combining on
    // the map side — a row_number window here would shuffle and sort every
    // (query, doc) score row
    assert(p.contains("partial_top_k"), p.take(2000))
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window "),
      "per-query cut must not be a window sort: " + p.take(1500))
    // shared term stats and the term→query fan-out ride broadcasts
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q178: OPQ rotation keeps q167's codes-only broadcast shape (r12)") {
    val p = plan("q178_ivfpq_opq")
    // the rotation is a projection (d dots per row) — it must add NO
    // join, shuffle or cartesian to the residual-IVFADC serving plan
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastExchange"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q180: classifier model broadcasts; one map-side-combined doc agg (r12)") {
    val p = plan("q180_quality_classifier")
    // the weight table must NEVER shuffle the corpus against it
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      p.take(2000))
  }

  test("q183: perceptual hashes codegen once each, one scan, no shuffle") {
    val pl = plan("q183_phash")
    // `*(n)` stages = whole-stage codegen; the expression must not fall
    // back to an interpreted projection
    assert(pl.contains("*(1)"), pl.take(800))
    assert(!pl.contains("Exchange"), "phash must not shuffle")
    assert(countOf(pl, "FileScan parquet") == 1)
    // exactly ONE perceptualhash evaluation per print: the no-print
    // filter runs on payload length, so pushing it down cannot duplicate
    // the hash work (each extra occurrence is a full per-row byte pass)
    assert(countOf(pl, "perceptualhash") == 2, pl.take(1200))
  }

  test("q184: phash near-dup joins on chunk equality, never nested-loop") {
    val pl = plan("q184_phash_neardup")
    assert(!pl.contains("BroadcastNestedLoopJoin") &&
      !pl.contains("CartesianProduct"), pl.take(800))
  }

  test("q187: bloom prunes before the anti-join; the corpus side broadcasts") {
    val pl = plan("q187_incremental_dedup")
    assert(pl.contains("might_contain") || pl.contains("BloomFilterMightContain"),
      "bloom membership probe must gate the join input: " + pl.take(800))
    // the hit fraction anti-joins against the (small) corpus fingerprint
    // set — broadcast, not a shuffled join
    assert(pl.contains("BroadcastHashJoin") && pl.contains("LeftAnti"),
      pl.take(1200))
  }

  test("catalog-mode read plans exactly like the path read (relation substitution)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    s2.conf.set("spark.graft.warehouse",
      java.nio.file.Files.createTempDirectory("graft-planspec-wh").toString)
    s2.sql("CREATE TABLE graft.plan_t (id BIGINT, v BIGINT, part STRING) " +
      "PARTITIONED BY (part)")
    s2.sql("INSERT INTO graft.plan_t SELECT id, id * 2, 'p' FROM range(100)")
    val root = graft.plans.GraftPaths.resolve(s2, "plan_t")
    def shape(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
        .replaceAll("#\\d+L?", "#x").split("== Initial Plan ==")(0)
    val viaCatalog = shape(s2.sql("SELECT id, v FROM graft.plan_t WHERE id < 10"))
    val viaPath = shape(graft.sources.Layout.readCurrent(s2, root)
      .filter(org.apache.spark.sql.functions.col("id") < 10)
      .select("id", "v"))
    // the substitution rule must not add operators: same scan, same
    // filter pushdown, same projection (modulo exprIds)
    assert(viaCatalog == viaPath,
      s"catalog plan diverges:\n$viaCatalog\n---\n$viaPath")
    s2.sql("DROP TABLE graft.plan_t")
  }

  test("q188: KMV aggregates partially on the map side (bounded shuffle)") {
    val pl = plan("q188_kmv_distinct")
    // the k-bounded TopKAgg must plan as an ObjectHashAggregate pair
    // (partial + final) — a window/sort formulation would shuffle every
    // distinct hash instead of k per (group x partition)
    assert(countOf(pl, "ObjectHashAggregate") >= 2, pl.take(1000))
    assert(!pl.contains("Window"), "KMV must not be a window sort")
  }

  test("q191: wedge joins are shuffle-hash, never a wedge-side sort (r14)") {
    val pl = plan("q191_triangles")
    // the m^1.5 wedge intermediate must stream unsorted through both its
    // joins — a SortMergeJoin would pay two 41M-row sorts at sf0.1
    assert(pl.contains("ShuffledHashJoin"), pl.take(1200))
    assert(!pl.contains("CartesianProduct") &&
      !pl.contains("BroadcastNestedLoopJoin"), pl.take(800))
  }

  test("q192: Holt runs the native scan, no quadratic HOF fold (r14)") {
    val pl = plan("q192_holt_forecast")
    assert(pl.contains("holt_scan"), pl.take(1200))
    // one groupBy collect + one posexplode — exactly two exchanges would
    // mean a stray repartition; the series collect is the only shuffle
    assert(countOf(pl, "Exchange hashpartitioning") == 1, pl.take(1200))
  }

  test("q193: audio profile reads the payload once, frame grain after (r14)") {
    val pl = plan("q193_audio_silence")
    // ONE parquet scan: energies, the island window and both aggregates
    // all derive from the single exploded frame grid
    assert(countOf(pl, "FileScan parquet") == 1, pl.take(1200))
    assert(pl.contains("frame_energy"), pl.take(1200))
    assert(countOf(pl, "frame_energy") == 1,
      "payload bytes must be scanned once, not per derived column")
  }

  test("q196: blocklist screen is one codegen'd pass, no shuffle (r14)") {
    val pl = plan("q196_blocklist_screen")
    assert(pl.contains("multi_contains"), pl.take(1200))
    assert(countOf(pl, "multi_contains") == 1,
      "the size() column must reuse the hits array, not re-walk the text")
    assert(!pl.contains("Exchange"), "screening must not shuffle")
  }

  test("q200: CUSUM is the native scan; two aggregation shuffles, no join (r14)") {
    val pl = plan("q200_cusum_drift")
    assert(pl.contains("cusum_scan"), pl.take(1200))
    // daily rollup on (pri, d) + the per-pri series collect — a third
    // exchange would be a stray repartition; the mean rides the SAME
    // collect aggregate (no separate mu join)
    assert(countOf(pl, "Exchange hashpartitioning") == 2, pl.take(1200))
    assert(!pl.contains("Join"), pl.take(800))
  }

  test("q201: burstiness is two partial-agg shuffles and nothing else (r14)") {
    val pl = plan("q201_burstiness")
    // (user, day) counts then per-user moments — each map-side combined
    assert(countOf(pl, "Exchange hashpartitioning") == 2, pl.take(1200))
    assert(countOf(pl, "partial_") >= 2, pl.take(1200))
    assert(!pl.contains("Join"), pl.take(800))
  }

  test("q203: RRF fuses top-N lists with broadcast joins, never corpus-sized (r15)") {
    val pl = plan("q203_hybrid_rrf")
    // corpus-side work (BM25 scoring, the query-vector attach) must ride
    // broadcasts; the ONE allowed SortMergeJoin is the fuse's full-outer
    // over two <= topN-row rankings (Spark cannot broadcast FULL OUTER —
    // and need not: both inputs are already top-N cuts)
    assert(countOf(pl, "SortMergeJoin") <= 1, pl.take(1500))
    assert(pl.contains("BroadcastHashJoin") ||
      pl.contains("BroadcastNestedLoopJoin"), pl.take(1500))
    assert(pl.contains("TakeOrderedAndProject"),
      "the fused cut must be top-k, not a global sort")
  }

  test("q204: containment joins on shingle-hash equality, never nested-loop (r15)") {
    val pl = plan("q204_containment_join")
    assert(!pl.contains("NestedLoop") && !pl.contains("CartesianProduct"),
      pl.take(1200))
    assert(pl.contains("bit") || pl.contains("xxhash64") ||
      pl.contains("InMemory"), "postings carry hashed shingles")
    graft.util.Caches.releaseAll()
  }

  test("q205: the KMV overlap matrix joins sketches, never data (r15)") {
    val pl = plan("q205_kmv_overlap")
    // pair side is |groups| rows of O(k) lists — must broadcast; the only
    // hash exchanges belong to the sketch build (dedupe + fold)
    assert(pl.contains("BroadcastHashJoin") ||
      pl.contains("BroadcastNestedLoopJoin"), pl.take(1500))
    assert(!pl.contains("SortMergeJoin"), pl.take(1500))
  }

  test("q207: quadrant prints hash once per quadrant, equi-join candidates (r15)") {
    val pl = plan("q207_quadrant_match")
    // the prints build is CACHED and every consumer (both join sides +
    // the hot-print count each side's anti-join broadcasts) reads the
    // same InMemoryTableScan — the plan TEXT prints the cached build's 4
    // hashes once per consumer subtree (≤ 16 textual hits: x, y, and the
    // hot aggregate under each side's broadcast), but the hashes compute
    // once
    assert(pl.contains("InMemoryTableScan"),
      s"quadrant prints must come from the shared cache: ${pl.take(1200)}")
    assert(countOf(pl, "perceptualhash") <= 16, pl.take(1200))
    assert(!pl.contains("NestedLoop") && !pl.contains("CartesianProduct"),
      pl.take(1200))
    // the hot-print guard is a BROADCAST anti-join — the cap must never
    // shuffle the print table to drop a handful of degenerate keys
    assert(pl.contains("BroadcastHashJoin") && pl.contains("LeftAnti"),
      pl.take(1500))
    graft.util.Caches.releaseAll()
  }
}
