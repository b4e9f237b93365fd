package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * Reference semantics covered:
  *  - D2 keyed keep-last (/root/reference/extraction.py:105,
  *    `drop_duplicates(subset=['Date','Ticker'], keep='last')`): pandas
  *    keep-last depends on physical row order; a distributed engine must make
  *    the precedence EXPLICIT. [[keepLast]] takes an ordering and keeps the
  *    first row per key under it (so "keep latest by ts" = orderBy ts desc).
  *  - D3/J2 incremental anti-join append (/root/reference/loading.py:159-169,
  *    `INSERT .. WHERE NOT EXISTS` executed in PostgreSQL): moved inside the
  *    Spark plan as a left_anti join, so the whole load is one Catalyst plan.
  *  - D1 union (/root/reference/extraction.py:79,104).
  *
  * Scale notes: keepLast is a single hash-shuffle by key + per-partition sort
  * (window), no global sort. At 100 TB the anti-join shuffles both sides by
  * the key unless the target fits broadcast; for true incremental loads
  * prefer a storage-layer MERGE, which this models.
  */
object Dedup {

  /** Keep exactly one row per key: the FIRST under `precedence`.
    * Deterministic iff `precedence` is a total order within each key —
    * callers should include a unique tiebreaker column.
    */
  def keepLast(df: DataFrame, keys: Seq[String], precedence: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(precedence: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact whole-row (or subset) dedup. */
  def exact(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    if (cols.isEmpty) df.distinct() else df.dropDuplicates(cols)

  /** Rows of `staging` whose key is absent from `target` — the reference's
    * NOT EXISTS insert filter (loading.py:166-168) as a left_anti join.
    */
  def newRows(staging: DataFrame, target: DataFrame, keys: Seq[String]): DataFrame =
    staging.join(target.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** D1: order-insensitive vertical union by column name. */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionByName _)

  /** D16: INCREMENTAL corpus dedup — the daily-ingest shape at 100 TB:
    * keep only the `fresh` rows whose content fingerprint the existing
    * corpus has never seen, WITHOUT a full-width fresh×corpus anti-join.
    * The corpus's fingerprint set folds into a bloom filter (one pass, a
    * few MB of bits inlined as a literal — [[BloomPrune]]'s machinery);
    * fresh rows the bloom rejects are DEFINITELY new and never enter a
    * join; only the bloom's hits (true replays + false positives) anti-
    * join against the corpus fingerprints. EXACT: blooms have no false
    * negatives, and the anti-join discards the false positives — the
    * filter only moves work, never answers. Cost = one corpus fingerprint
    * scan + a join over the hit FRACTION; at a replay rate of a few
    * percent that is the difference between shuffling the whole fresh
    * batch against the corpus and shuffling a sliver.
    *
    * @param expectedItems sizes the sketch to the corpus's distinct
    *                      fingerprint estimate ([[BloomPrune.bloomAgg]]
    *                      documents the session caps).
    */
  def incrementalNew(fresh: DataFrame, corpus: DataFrame, fpCol: String,
                     expectedItems: Long = 1000000L): DataFrame = {
    // sizing past the session's sketch caps would SILENTLY saturate the
    // filter and pull the whole batch into the join (BloomPrune's guard)
    BloomPrune.requireWithinCaps(fresh.sparkSession, expectedItems)
    // the corpus fingerprint set is consumed twice (bloom build +
    // anti-join) and is narrow — cache it. The FRESH batch is NOT cached:
    // at the daily-ingest scale this op exists for, spilling the full
    // batch to read it twice costs more than recomputing two cheap
    // scan+filter branches over the source (review fix)
    val cfp = graft.util.Caches.cache(
      corpus.select(col(fpCol)).distinct()).toDF
    val bloomRow = cfp.agg(BloomPrune.bloomAgg(col(fpCol), expectedItems))
      .head()
    if (bloomRow.isNullAt(0)) return fresh // empty corpus: everything new
    val bloomBytes = bloomRow.getAs[Array[Byte]](0)
    val hit = BloomPrune.mightContain(bloomBytes, col(fpCol))
    fresh.filter(!hit).unionByName(
      fresh.filter(hit).join(cfp, Seq(fpCol), "left_anti"))
  }

  /** Collapse near-dup groups to ONE representative each — the curation step
    * after connected components ([[MinHashDedup.dupGroups]]): of every dup
    * group keep the best row under `better` (e.g. longest text, highest
    * quality score; include a unique tiebreaker for determinism), and keep
    * every row that belongs to no group (singletons are their own
    * component).
    *
    * Scale shape: `components` is dup-graph-sized (tiny next to the corpus),
    * so the left join broadcasts it; the winner pick is then one keyed
    * window. The corpus is scanned once and shuffled once (by component).
    *
    * @param components (id, component) pairs as produced by dupGroups
    * @return docs rows + (component, group_size), winners only
    */
  def keepRepresentative(docs: DataFrame, components: DataFrame, idCol: String,
                         better: Seq[Column]): DataFrame = {
    // "component"/"group_size" are OUTPUT columns — a clash would silently
    // clobber user data (same reserved-name contract as AsOfJoin.backward).
    // The join-side columns are __-prefixed so a docs table that already has
    // an "id" column (or idCol == "id") resolves unambiguously.
    Seq("component", "group_size").foreach(c =>
      require(!docs.columns.contains(c),
        s"docs already has a column named '$c' (reserved for keepRepresentative output)"))
    val withComp = docs.join(
        broadcast(components.select(col("id").as("__rep_id"),
          col("component").as("__rep_component"))),
        docs(idCol) === col("__rep_id"), "left")
      .drop("__rep_id")
      .withColumn("component", coalesce(col("__rep_component"), col(idCol)))
      .drop("__rep_component")
    val w = Window.partitionBy("component").orderBy(better: _*)
    withComp
      .withColumn("group_size", count(lit(1)).over(Window.partitionBy("component")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
