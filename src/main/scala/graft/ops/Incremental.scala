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
}
