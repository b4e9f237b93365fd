package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance over a change data feed
  * — the consumer [[graft.sources.Layout.changeFeed]] exists for: keep a
  * grouped (count, sums) rollup current by processing only the CHANGED
  * rows between two versions, never re-scanning the base table. On a
  * 100 TB base with a 1-partition daily merge, the refresh cost is the
  * feed size, not the table size — the classic self-maintainable-view
  * result (counts and sums are invertible; min/max are not and need a
  * recompute or a monotonic-input contract).
  *
  * State schema: `keys…, n_rows, sum_<c>…`. Null measure values are
  * summed as 0 (invertibility needs every row's contribution to be
  * defined; a null that "becomes" a value under update must change the
  * sum by exactly that value).
  *
  * Scale shape: the delta is one hash aggregate over the FEED (tiny);
  * the merge is a keyed full-outer join against the state — broadcast
  * when the delta's key set is small (the common case), shuffle
  * otherwise. Groups whose row count reaches zero are dropped, so state
  * never accretes tombstones.
  */
object Incremental {

  /** Build the initial materialized state from a full snapshot. */
  def materialize(df: DataFrame, keys: Seq[String],
                  sumCols: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sumCols.map(c => sum(coalesce(col(c), lit(0))).as(s"sum_$c")): _*)

  /** Fold one change feed (insert / delete / update_pre / update_post
    * rows, [[graft.sources.Layout.changeFeed]]'s shape) into the state:
    * post-images add, pre-images and deletes subtract. Applying feeds
    * v0→v1→…→vN in order yields exactly [[materialize]] of vN — the
    * invariant IncrementalSpec pins against random histories.
    */
  def applyFeed(state: DataFrame, feed: DataFrame, keys: Seq[String],
                sumCols: Seq[String]): DataFrame = {
    val sign = when(col("_change_type").isin("insert", "update_post"), 1L)
      .otherwise(-1L)
    val delta = feed.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("__d_n"),
        sumCols.map(c =>
          sum(coalesce(col(c), lit(0)) * sign).as(s"__d_$c")): _*)
    val merged = state.join(delta, keys, "full_outer")
      .select(keys.map(col) ++
        Seq((coalesce(col("n_rows"), lit(0L)) + coalesce(col("__d_n"), lit(0L)))
          .as("n_rows")) ++
        sumCols.map(c =>
          (coalesce(col(s"sum_$c"), lit(0)) + coalesce(col(s"__d_$c"), lit(0)))
            .as(s"sum_$c")): _*)
    merged.filter(col("n_rows") > 0)
  }

  /** Initial per-group MOMENT state — (n, Σv, Σv², non-null count) —
    * from which mean, variance and stddev derive ([[derivedStats]]).
    * Maintained by the plain [[applyFeed]]: all three sums are
    * signed-invertible, so the moment view is self-maintainable under
    * arbitrary change feeds, unlike min/max. The extra columns are
    * `__sq_<valueCol>` and `__nn_<valueCol>`; the non-null count exists
    * so the derived stats keep SQL `avg`/`var_pop` semantics (nulls are
    * IGNORED, not zero-counted — `n_rows` counts every row).
    */
  def materializeMoments(df: DataFrame, keys: Seq[String],
                         valueCol: String): DataFrame =
    materialize(withMomentCols(df, valueCol), keys, momentCols(valueCol))

  /** Fold one change feed into a moment state; see [[materializeMoments]]. */
  def applyFeedMoments(state: DataFrame, feed: DataFrame, keys: Seq[String],
                       valueCol: String): DataFrame =
    applyFeed(state, withMomentCols(feed, valueCol), keys, momentCols(valueCol))

  private def momentCols(valueCol: String): Seq[String] =
    Seq(valueCol, s"__sq_$valueCol", s"__nn_$valueCol")

  private def withMomentCols(df: DataFrame, valueCol: String): DataFrame =
    df.withColumn(s"__sq_$valueCol", col(valueCol) * col(valueCol))
      .withColumn(s"__nn_$valueCol",
        when(col(valueCol).isNotNull, 1L).otherwise(0L))

  /** Mean / population variance / stddev derived from a moment state —
    * the read-side projection (never stored; deriving keeps the stored
    * state invertible). Matches SQL `avg`/`var_pop`/`stddev_pop` exactly:
    * nulls never contribute, and an all-null group derives null stats.
    */
  def derivedStats(state: DataFrame, valueCol: String): DataFrame = {
    val n = col(s"sum___nn_$valueCol").cast("double")
    val mean = when(n > 0, col(s"sum_$valueCol") / n)
    val varPop = when(n > 0,
      col(s"sum___sq_$valueCol") / n - mean * mean)
    // clamp tiny negative values from floating cancellation
    val v = when(varPop.isNotNull, greatest(varPop, lit(0.0)))
    state.withColumn(s"avg_$valueCol", mean)
      .withColumn(s"var_$valueCol", v)
      .withColumn(s"stddev_$valueCol", sqrt(v))
  }

  /** Initial per-group (count, min, max) state from a full snapshot.
    * Min/max ignore null values, as the aggregates do.
    */
  def materializeMinMax(df: DataFrame, keys: Seq[String],
                        valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as(s"min_$valueCol"),
        max(col(valueCol)).as(s"max_$valueCol"))

  /** Fold one change feed into a min/max state. Min and max are NOT
    * self-maintainable under deletion (removing the extremum reveals an
    * unknown runner-up), so each group carries an implicit INVALIDATION
    * bit: a feed that removes a value at-or-beyond a group's stored
    * extremum (`removed_min ≤ stored_min` or `removed_max ≥ stored_max` —
    * duplicates make equality removal unsafe too) marks the group invalid,
    * and invalid groups alone are recomputed from `current` (the LIVE
    * snapshot the feed leads to) via a semi-join-pruned scan. Everything
    * else — inserts, and deletions strictly inside the (min, max) envelope
    * — folds incrementally: adds can only extend the envelope, interior
    * removals cannot move it.
    *
    * Scale shape: the delta is one aggregate over the feed; the recompute
    * scans only the invalidated groups' rows (partition-pruned when `keys`
    * align with the table layout), which for the typical daily-merge feed
    * is a handful of groups, not the table.
    */
  def applyFeedMinMax(state: DataFrame, feed: DataFrame, keys: Seq[String],
                      valueCol: String, current: DataFrame): DataFrame = {
    val mn = s"min_$valueCol"
    val mx = s"max_$valueCol"
    val isAdd = col("_change_type").isin("insert", "update_post")
    val delta = feed.groupBy(keys.map(col): _*).agg(
      sum(when(isAdd, 1L).otherwise(-1L)).as("__d_n"),
      min(when(isAdd, col(valueCol))).as("__add_min"),
      max(when(isAdd, col(valueCol))).as("__add_max"),
      min(when(!isAdd, col(valueCol))).as("__rm_min"),
      max(when(!isAdd, col(valueCol))).as("__rm_max"))
    val joined = state.join(delta, keys, "full_outer")
      .withColumn("__n",
        coalesce(col("n_rows"), lit(0L)) + coalesce(col("__d_n"), lit(0L)))
      // the invalidation bit: some non-null value was removed AND the
      // group's envelope cannot prove the removal was interior
      .withColumn("__invalid", col("__rm_min").isNotNull &&
        (col(mn).isNull || col("__rm_min") <= col(mn) ||
          col("__rm_max") >= col(mx)))
    val valid = joined.filter(!col("__invalid"))
      .select(keys.map(col) ++ Seq(col("__n").as("n_rows"),
        least(col(mn), col("__add_min")).as(mn),
        greatest(col(mx), col("__add_max")).as(mx)): _*)
      .filter(col("n_rows") > 0)
    val invalidKeys = joined.filter(col("__invalid"))
      .select(keys.map(col): _*)
    val recomputed = materializeMinMax(
      current.join(invalidKeys, keys, "left_semi"), keys, valueCol)
    valid.unionByName(recomputed)
  }

  /** Initial state of a materialized EQUI-JOIN view `V = A ⋈ B` (inner
    * join on `joinKeys`) from full snapshots of both sides.
    */
  def materializeJoin(a: DataFrame, b: DataFrame,
                      joinKeys: Seq[String]): DataFrame =
    a.join(b, joinKeys)

  /** Fold change feeds from BOTH sides into a join-view state by
    * AFFECTED-KEY RECOMPUTE — the standard delta-join maintenance shape
    * reduced to one rule that is correct for arbitrary multiset changes
    * (inserts, deletes, updates, on either or both sides at once): any
    * join-key value appearing in either feed has its entire slice of the
    * view recomputed from the CURRENT snapshots; every other view row is
    * untouched (neither side's rows under that key changed, so the join
    * under it cannot have). Handling the pure insert-only case via
    * `ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB` would save the recompute read but is wrong
    * the moment a delete or update appears — and the recompute here is
    * semi-join PRUNED to the affected keys, so its cost is the changed
    * keys' rows, never |A|+|B|.
    *
    * Scale shape: one distinct over the feeds (tiny), one broadcast-able
    * anti-join against the view, two semi-join-pruned snapshot reads
    * (partition-pruned further when `joinKeys` align with either table's
    * layout), one join of the pruned slices.
    *
    * @param currentA/currentB the snapshots the feeds LEAD TO (the same
    *        contract as [[applyFeedMinMax]]'s `current`)
    */
  def applyFeedJoin(view: DataFrame, feedA: DataFrame, feedB: DataFrame,
                    currentA: DataFrame, currentB: DataFrame,
                    joinKeys: Seq[String]): DataFrame = {
    val keyCols = joinKeys.map(col)
    val touched = feedA.select(keyCols: _*)
      .unionByName(feedB.select(keyCols: _*)).distinct()
    val kept = view.join(touched, joinKeys, "left_anti")
    val recomputed = currentA.join(touched, joinKeys, "left_semi")
      .join(currentB.join(touched, joinKeys, "left_semi"), joinKeys)
    kept.unionByName(recomputed)
  }

  private val AppliedMeta = "_applied_table_version"
  private val AppliedMetaA = "_applied_table_version_a"
  private val AppliedMetaB = "_applied_table_version_b"

  /** Create `viewRoot` as a versioned materialized JOIN view of two
    * versioned tables' live versions, with one atomic watermark PER SIDE
    * (same exactly-once contract as [[initFollowingView]]).
    */
  def initFollowingJoinView(spark: org.apache.spark.sql.SparkSession,
                            tableRootA: String, tableRootB: String,
                            viewRoot: String, joinKeys: Seq[String]): String = {
    val na = graft.sources.Layout.currentVersionNumber(spark, tableRootA)
    val nb = graft.sources.Layout.currentVersionNumber(spark, tableRootB)
    graft.sources.Layout.publishVersion(spark, viewRoot,
      materializeJoin(
        graft.sources.Layout.readVersion(spark, tableRootA, na),
        graft.sources.Layout.readVersion(spark, tableRootB, nb), joinKeys),
      Map(AppliedMetaA -> na.toString, AppliedMetaB -> nb.toString))
  }

  /** Catch a join view up to BOTH tables' live versions in one commit:
    * one change feed per side spanning `(applied, current]`, folded via
    * [[applyFeedJoin]]. Either side's retention loss (its watermark
    * version vacuumed) falls back to a full rebuild from the live
    * snapshots — incremental when retention allows, recompute when it
    * doesn't, never wrong. Already-current on both sides no-ops, so a
    * replayed refresh commits nothing twice.
    *
    * @param rowKeysA/rowKeysB each table's ROW identity (its feed's join
    *                          keys); `joinKeys` is the VIEW's join
    * @return ((fromA, toA), (fromB, toB)) applied
    */
  def refreshFollowingJoinView(spark: org.apache.spark.sql.SparkSession,
                               tableRootA: String, tableRootB: String,
                               viewRoot: String,
                               rowKeysA: Seq[String], rowKeysB: Seq[String],
                               joinKeys: Seq[String]): ((Int, Int), (Int, Int)) = {
    val viewVer = graft.sources.Layout.currentVersionNumber(spark, viewRoot)
    def watermark(key: String): Int = graft.sources.Layout
      .versionMeta(spark, viewRoot, viewVer, key)
      .getOrElse(throw new IllegalStateException(
        s"$viewRoot v$viewVer has no $key watermark — not a following join view"))
      .trim.toInt
    val (appliedA, appliedB) = (watermark(AppliedMetaA), watermark(AppliedMetaB))
    val curA = graft.sources.Layout.currentVersionNumber(spark, tableRootA)
    val curB = graft.sources.Layout.currentVersionNumber(spark, tableRootB)
    if (curA == appliedA && curB == appliedB) return ((appliedA, appliedA), (appliedB, appliedB))
    require(curA >= appliedA && curB >= appliedB,
      s"a table is BEHIND the view's watermark (A v$curA/w$appliedA, " +
        s"B v$curB/w$appliedB) — was a table rolled back?")
    val snapA = graft.sources.Layout.readVersion(spark, tableRootA, curA)
    val snapB = graft.sources.Layout.readVersion(spark, tableRootB, curB)
    val state =
      if (versionReadable(spark, tableRootA, appliedA) &&
          versionReadable(spark, tableRootB, appliedB)) {
        def feed(root: String, from: Int, to: Int, rowKeys: Seq[String],
                 donor: DataFrame) =
          if (from == to)
            // empty feed with the feed's shape — only _change_type and the
            // join keys are read downstream
            donor.filter(lit(false)).withColumn("_change_type", lit(""))
          else graft.sources.Layout.changeFeed(spark, root, from, to, rowKeys)
        applyFeedJoin(graft.sources.Layout.readCurrent(spark, viewRoot),
          feed(tableRootA, appliedA, curA, rowKeysA, snapA),
          feed(tableRootB, appliedB, curB, rowKeysB, snapB),
          snapA, snapB, joinKeys)
      } else materializeJoin(snapA, snapB, joinKeys)
    graft.sources.Layout.publishVersion(spark, viewRoot, state,
      Map(AppliedMetaA -> curA.toString, AppliedMetaB -> curB.toString))
    ((appliedA, curA), (appliedB, curB))
  }

  /** Create `viewRoot` as a versioned MATERIALIZED VIEW of `tableRoot`'s
    * live version: the grouped (count, sums) state plus an atomic
    * "derived from table version N" watermark
    * ([[graft.sources.Layout.publishVersion]] metadata). From here on,
    * [[refreshFollowingView]] advances the view by CHANGE FEED only.
    */
  def initFollowingView(spark: org.apache.spark.sql.SparkSession,
                        tableRoot: String, viewRoot: String,
                        keys: Seq[String], sumCols: Seq[String]): String = {
    val n = graft.sources.Layout.currentVersionNumber(spark, tableRoot)
    graft.sources.Layout.publishVersion(spark, viewRoot,
      materialize(graft.sources.Layout.readVersion(spark, tableRoot, n),
        keys, sumCols),
      Map(AppliedMeta -> n.toString))
  }

  /** Catch the view up to the table's live version by applying ONE change
    * feed spanning `(applied, current]` — refresh cost is the feed size,
    * never the table size. The commit is exactly-once by construction:
    * state and watermark publish atomically, so a crashed or REPLAYED
    * refresh (a restarted streaming batch, a second maintenance job) sees
    * the already-advanced watermark and no-ops instead of double-applying
    * the feed.
    *
    * @param rowKeys the table's row identity (the feed's join keys);
    *                `keys`/`sumCols` are the VIEW's grouping and measures
    * @return (fromVersion, toVersion) applied; equal when already current
    */
  def refreshFollowingView(spark: org.apache.spark.sql.SparkSession,
                           tableRoot: String, viewRoot: String,
                           rowKeys: Seq[String], keys: Seq[String],
                           sumCols: Seq[String]): (Int, Int) = {
    val viewVer = graft.sources.Layout.currentVersionNumber(spark, viewRoot)
    val applied = graft.sources.Layout
      .versionMeta(spark, viewRoot, viewVer, AppliedMeta)
      .getOrElse(throw new IllegalStateException(
        s"$viewRoot v$viewVer has no $AppliedMeta watermark — not a following view"))
      .trim.toInt
    val tableVer = graft.sources.Layout.currentVersionNumber(spark, tableRoot)
    if (tableVer == applied) return (applied, applied)
    require(tableVer > applied, s"table at v$tableVer is BEHIND the view's " +
      s"watermark v$applied — was the table rolled back?")
    // Retention loss: if the table vacuumed past the view's watermark, the
    // (applied, current] feed is gone — fall back to a FULL rebuild from
    // the live snapshot (the standard CDF-consumer contract: incremental
    // when retention allows, recompute when it doesn't — never wrong).
    val state =
      if (versionReadable(spark, tableRoot, applied)) {
        val feed = graft.sources.Layout.changeFeed(
          spark, tableRoot, applied, tableVer, rowKeys)
        applyFeed(
          graft.sources.Layout.readCurrent(spark, viewRoot), feed, keys, sumCols)
      } else
        materialize(
          graft.sources.Layout.readVersion(spark, tableRoot, tableVer),
          keys, sumCols)
    graft.sources.Layout.publishVersion(spark, viewRoot, state,
      Map(AppliedMeta -> tableVer.toString))
    (applied, tableVer)
  }

  private def versionReadable(spark: org.apache.spark.sql.SparkSession,
                              root: String, version: Int): Boolean =
    try { graft.sources.Layout.resolveVersion(spark, root, version); true }
    catch { case _: IllegalArgumentException => false }
}
