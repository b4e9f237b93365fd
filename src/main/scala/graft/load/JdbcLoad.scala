package graft.load

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** S6/S7: JDBC sink with the reference's tuning
  * (/root/reference/loading.py:129-151): batched inserts of 1000 rows,
  * rewriteBatchedStatements, explicit write parallelism = connection budget
  * (the reference repartitions to 4, /root/reference/loading.py:116).
  *
  * No PostgreSQL exists in this environment; the full write path (DDL,
  * batched inserts, append-new idempotence) is integration-tested against
  * embedded Derby (JdbcSpec), and the options map is the PostgreSQL
  * contract.
  */
object JdbcLoad {

  def options(url: String, table: String, user: String, password: String,
              batchSize: Int = 1000,
              driver: String = "org.postgresql.Driver"): Map[String, String] = Map(
    "url" -> url,
    "dbtable" -> table,
    "user" -> user,
    "password" -> password,
    "batchsize" -> batchSize.toString,
    "rewriteBatchedStatements" -> "true",
    "driver" -> driver)

  /** Overwrite load (reference full-history path, loading.py:129-137). */
  def overwrite(df: DataFrame, opts: Map[String, String], connections: Int = 4): Unit =
    df.repartition(connections).write.format("jdbc").options(opts)
      .mode(SaveMode.Overwrite).save()

  /** Append load of *new rows only* — the staging + NOT EXISTS insert
    * (loading.py:141-176) collapsed into one Spark plan: anti-join inside
    * the engine, append the survivors. Idempotent under reruns.
    *
    * `keys` must be non-null: the anti-join uses equality, exactly like the
    * reference's `NOT EXISTS (… AND t.k = s.k)` — a NULL key never matches,
    * so NULL-key rows would re-insert on every rerun in BOTH formulations.
    */
  def appendNew(staging: DataFrame, target: DataFrame, keys: Seq[String],
                opts: Map[String, String], connections: Int = 4): Unit =
    graft.ops.Dedup.newRows(staging, target, keys)
      .repartition(connections).write.format("jdbc").options(opts)
      .mode(SaveMode.Append).save()

  /** Stream-driven incremental load: every micro-batch dedups itself on
    * `keys` (one AvailableNow batch can fold several arriving files, so
    * within-batch key collisions are real) and then runs [[appendNew]]
    * against the CURRENT table state — the reference's cron'd staging +
    * NOT EXISTS insert, upgraded to Structured Streaming. Because each
    * batch anti-joins against the live table, the sink stays idempotent
    * even under micro-batch REPLAY after a crash (the at-least-once window
    * Spark's checkpoint leaves for non-transactional sinks) — the property
    * the reference gets from its SQL `NOT EXISTS`, preserved here. Same
    * non-null-keys precondition as [[appendNew]].
    * The target table must already exist (seed it with [[overwrite]]).
    * Blocks until the drain completes (AvailableNow semantics).
    *
    * Scale note: each batch re-reads the target's key columns through the
    * JDBC source, so per-batch cost tracks TABLE size, not batch size. For
    * large targets push the existence check down: pass `opts("dbtable")` as
    * a subquery restricted to the batch's key range, or move to a DB-side
    * MERGE — the reference's own NOT EXISTS runs DB-side for this reason.
    */
  def streamAppendNew(stream: DataFrame, keys: Seq[String],
                      opts: Map[String, String], checkpoint: String,
                      connections: Int = 4): Unit =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val target = batch.sparkSession.read.format("jdbc").options(opts).load()
        appendNew(batch.dropDuplicates(keys), target, keys, opts, connections)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
}
