package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.sources.Layout

/** Streaming SINK into a graft versioned root — the `writeStream` face of
  * the foreachBatch helpers ([[StreamingOps.streamUpsertRows]] et al.), so
  * a pipeline reads AND writes the lakehouse through stock streaming API:
  *
  * {{{
  * df.writeStream.format("graft-sink")
  *   .option("path", root)
  *   .option("keys", "id")            // → merge-on-read UPSERT per batch
  *   //  no "keys"                    // → pure APPEND per batch
  *   .option("checkpointLocation", ckpt)
  *   .start()
  * }}}
  *
  * Every micro-batch commits ONE table version under
  * [[Layout.withCommitRetry]] (concurrent maintenance can't kill the
  * query), idempotently via the manifest txn watermark keyed by
  * `txnAppId` (default: the checkpoint location — the identity Structured
  * Streaming already assigns the query): a batch replayed after a crash
  * between table commit and checkpoint commit no-ops instead of
  * re-applying — exactly-once COMMITS over at-least-once delivery, the
  * same contract as the foreachBatch helpers.
  *
  * Composes with [[GraftChangeSource]] for table-to-table streaming:
  * `readChangeStream(src) → transform → writeStream.format("graft-sink")` keeps
  * a derived versioned table following a source table with nothing but
  * engine machinery (ChangeStreamSpec pins the loop).
  *
  * Named `graft-sink` (not bare `graft`): a registered batch-readable
  * short name would make Spark's ResolveSQLOnFile claim the `graft.`…``
  * SQL DML targets as direct-query-on-files BEFORE GraftDml's rule runs,
  * breaking the SQL write surface.
  *
  * V1 `Sink` by design (the micro-batch arrives as a DataFrame the layout
  * writers consume directly); the batch frame is rebased onto its computed
  * RDD first ([[Shim.asBatch]] — the ForeachBatchSink trick) because the
  * writers run several actions over it.
  */
class GraftSinkProvider extends StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft-sink"

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft sink: 'path' option (the versioned root) is required"))
    val keys = parameters.get("keys")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    // partitioning belongs to the TABLE (its manifest), not the stream
    require(partitionColumns.isEmpty,
      "graft sink: partitionBy is the table's manifest spec — do not set " +
        "it on the stream")
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(root)
    new GraftSink(root, keys, appId)
  }
}

private[streaming] class GraftSink(root: String, keys: Option[Seq[String]],
                                   appId: String) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = Shim.asBatch(data)
    Layout.withCommitRetry() {
      keys match {
        case Some(ks) =>
          Layout.upsertVersionedRows(batch.sparkSession, root, batch, ks,
            txn = Some((appId, batchId)))
        case None =>
          Layout.appendVersionedRows(batch.sparkSession, root, batch,
            txn = Some((appId, batchId)))
      }
    }
    ()
  }

  override def toString: String = s"GraftSink[$root]"
}
