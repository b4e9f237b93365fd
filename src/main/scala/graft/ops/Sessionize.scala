package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the canonical event-log enrichment the
  * funnel/retention family ([[Funnels]]) presumes and every clickstream
  * or interaction-log pipeline (reference domain: per-entity time
  * series, /root/reference/extraction.py:105) runs first: group an
  * entity's events into sessions separated by inactivity gaps longer
  * than a threshold. The BATCH face of
  * [[graft.streaming.Sessionize]] (flatMapGroupsWithState) — the same
  * boundary-inclusive convention (an event at exactly the gap continues
  * the session), so backfills and the live stream agree on session keys.
  *
  * Semantics: events of one entity, ordered by timestamp; a NEW session
  * starts at the first event and at every event whose gap from the
  * previous event is STRICTLY greater than `gapSeconds` (an event landing
  * exactly on the boundary continues the session — the common
  * half-open-window convention). `session_seq` is the 1-based running
  * count of session starts per entity, so `(entity, session_seq)` is the
  * session key.
  *
  * Determinism under timestamp ties: the gap between equal timestamps is
  * 0, so tied events never start a session and every member of a tie
  * group lands in the same session regardless of intra-tie sort order —
  * `session_seq` and [[sessionStats]] are therefore tie-invariant (the
  * deterministic public contract). The per-row `is_session_start` flag is
  * NOT: when a session's FIRST timestamp is shared by several rows that
  * differ in other columns, which physical row carries `true` depends on
  * the engine's intra-tie order. Consumers needing a tie-stable start
  * row should pick it themselves from the session key (e.g. min over a
  * total order within `(entity, session_seq)`).
  *
  * Scale shape: ONE shuffle at entity grain and ONE sort. The running
  * flag-sum must consume the MATERIALIZED start flag (a window function
  * cannot nest inside another), so the plan is two Window nodes — but
  * they share the identical partitioning and ordering, so the second
  * reuses the first's sort: one Exchange, one Sort, two streaming passes
  * (pinned in SessionizeSpec). Per-entity event counts bound the sorted
  * run (the [[Funnels.sequenceMatch]] bounded-per-entity contract); no
  * per-entity array is ever materialized. [[sessionStats]] adds one keyed
  * aggregate at (entity, session) grain — map-side combinable, strictly
  * smaller than the event log.
  */
object Sessionize {

  /** Event→session assignment: the input rows (null entity/timestamp rows
    * dropped — they session nothing) plus `session_seq` (1-based per
    * entity) and `is_session_start`.
    */
  def sessionize(events: DataFrame, entityCol: String, tsCol: String,
                 gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"sessionize: gapSeconds must be > 0, got $gapSeconds")
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol).cast("timestamp"), 1).over(w)
    val gapUs = unix_micros(col(tsCol).cast("timestamp")) - unix_micros(prev)
    // the flag column materializes FIRST; the running sum reads the
    // materialized column (not the lag expression) so the lag is computed
    // once — two Window nodes over one shared sort, not three
    events.filter(col(entityCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("is_session_start",
        prev.isNull || gapUs > gapSeconds * 1000000L)
      .withColumn("session_seq",
        sum(col("is_session_start").cast("long")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Session-grain rollup: one row per (entity, session) with its event
    * count, first/last event times and exact-integer µs duration (a
    * single-event session has duration 0). All outputs exact — counts,
    * timestamps, one Long subtraction — hash-checkable in any engine.
    *
    * @return (entityCol, session_seq, n_events, start_ts, end_ts,
    *         duration_us)
    */
  def sessionStats(events: DataFrame, entityCol: String, tsCol: String,
                   gapSeconds: Long): DataFrame =
    sessionize(events, entityCol, tsCol, gapSeconds)
      .groupBy(col(entityCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol).cast("timestamp")).as("start_ts"),
        max(col(tsCol).cast("timestamp")).as("end_ts"))
      .withColumn("duration_us",
        unix_micros(col("end_ts")) - unix_micros(col("start_ts")))
}
