package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via flatMapGroupsWithState: gap-based
  * sessionization (the canonical KeyValueGroupedDataset stateful operator —
  * nothing in the reference, but the standard upgrade of its
  * "3-runs-a-day micro-batch" model to event-time sessions).
  *
  * Events are keyed by user; a session closes when the gap to the next
  * event EXCEEDS `gapMicros` — an event at exactly the gap continues the
  * session. This matches Spark's native `session_window`, which MERGES
  * touching [t, t+gap) windows (verified empirically and pinned by a
  * StreamingSpec boundary test), and the q69 oracle's strict `>` new-session
  * predicate. Closed sessions are emitted; the open tail
  * session stays in state across micro-batches. State per key is O(1)
  * (last-ts/start/count/sum), so executor memory is bounded by distinct
  * keys, not events — the property that matters at stream scale.
  *
  * Times are Long microseconds (engine-neutral, no tz coupling).
  */
object Sessionize {

  final case class Event(user_id: Long, tsMicros: Long, value: Double)
  final case class Session(user_id: Long, startMicros: Long, endMicros: Long,
      n_events: Long, sum_value: Double)
  final case class OpenSession(lastTs: Long, start: Long, n: Long, sum: Double)

  def apply(events: Dataset[Event], gapMicros: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          // groups arrive unordered; per-key-per-batch sort is bounded
          val sorted = it.toSeq.sortBy(_.tsMicros)
          var open = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            open match {
              case Some(s) if e.tsMicros - s.lastTs <= gapMicros =>
                open = Some(OpenSession(e.tsMicros, s.start, s.n + 1, s.sum + e.value))
              case Some(s) =>
                closed += Session(uid, s.start, s.lastTs, s.n, s.sum)
                open = Some(OpenSession(e.tsMicros, e.tsMicros, 1, e.value))
              case None =>
                open = Some(OpenSession(e.tsMicros, e.tsMicros, 1, e.value))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
