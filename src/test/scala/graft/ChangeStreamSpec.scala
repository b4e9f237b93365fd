package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Layout
import graft.streaming.StreamingOps
import graft.ops.Incremental

/** Streaming READ of a versioned table (GraftChangeSource, r11): offsets =
  * versions, micro-batches = change feeds, snapshot-then-follow and
  * startingVersion modes, checkpoint-resumed drains, short-name
  * registration, and end-to-end streaming view maintenance via applyFeed.
  */
class ChangeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def rows(rs: (Long, String, Long)*) = rs.toDF("id", "g", "v")

  private def mk(tag: String): (String, String, String) = {
    val base = Files.createTempDirectory(s"graft_cs_$tag").toString
    (base + "/t", base + "/out", base + "/ckpt")
  }

  private def drained(outDir: String): Set[(Long, String, Long, String)] =
    spark.read.parquet(outDir)
      .select($"id", $"g", $"v", $"_change_type")
      .as[(Long, String, Long, String)].collect().toSet

  test("snapshot-then-follow: batch 1 = snapshot as inserts; later drains = feeds") {
    val (root, out, ckpt) = mk("snap")
    Layout.initVersionedManifest(
      rows((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)), root, Seq("g"))
    StreamingOps.drainToParquet(
      StreamingOps.readChangeStream(spark, root, Seq("id")), out, ckpt)
    assert(drained(out) == Set(
      (1L, "a", 10L, "insert"), (2L, "a", 20L, "insert"), (3L, "b", 30L, "insert")))

    // two commits between drains collapse into ONE feed batch (0 -> 2)
    Layout.upsertVersionedRows(spark, root,
      rows((2L, "a", 99L), (4L, "b", 40L)), Seq("id"))
    Layout.deleteVersionedRows(spark, root, $"id" === 3L)
    StreamingOps.drainToParquet(
      StreamingOps.readChangeStream(spark, root, Seq("id")), out, ckpt)
    val expectedFeed = Layout.changeFeed(spark, root, 0, 2, Seq("id"))
      .select($"id", $"g", $"v", $"_change_type")
      .as[(Long, String, Long, String)].collect().toSet
    assert(drained(out) == Set(
      (1L, "a", 10L, "insert"), (2L, "a", 20L, "insert"), (3L, "b", 30L, "insert"))
      ++ expectedFeed)
    assert(expectedFeed == Set(
      (2L, "a", 20L, "update_pre"), (2L, "a", 99L, "update_post"),
      (4L, "b", 40L, "insert"), (3L, "b", 30L, "delete")))

    // nothing new committed -> a further drain adds nothing
    StreamingOps.drainToParquet(
      StreamingOps.readChangeStream(spark, root, Seq("id")), out, ckpt)
    assert(spark.read.parquet(out).count() == 3 + 4)
  }

  test("startingVersion mode emits feeds only — no initial snapshot") {
    val (root, out, ckpt) = mk("sv")
    Layout.initVersionedManifest(rows((1L, "a", 10L), (2L, "b", 20L)), root, Seq("g"))
    Layout.upsertVersionedRows(spark, root, rows((1L, "a", 11L)), Seq("id"))
    StreamingOps.drainToParquet(
      StreamingOps.readChangeStream(spark, root, Seq("id"),
        startingVersion = Some(0)), out, ckpt)
    assert(drained(out) == Set(
      (1L, "a", 10L, "update_pre"), (1L, "a", 11L, "update_post")))
  }

  test("checkpoint resume survives a NEW reader instance (version watermark)") {
    val (root, out, ckpt) = mk("resume")
    Layout.initVersionedManifest(rows((1L, "a", 1L)), root, Seq("g"))
    StreamingOps.drainToParquet(
      StreamingOps.readChangeStream(spark, root, Seq("id")), out, ckpt)
    Layout.upsertVersionedRows(spark, root, rows((2L, "a", 2L)), Seq("id"))
    // a brand-new stream over the same checkpoint resumes at v0, not the
    // snapshot — the snapshot must never be re-emitted
    StreamingOps.drainToParquet(
      StreamingOps.readChangeStream(spark, root, Seq("id")), out, ckpt)
    assert(drained(out) == Set((1L, "a", 1L, "insert"), (2L, "a", 2L, "insert")))
  }

  test("startingTimestamp starts feeds after the wall-clock instant") {
    val (root, out, ckpt) = mk("ts")
    Layout.initVersionedManifest(rows((1L, "a", 10L)), root, Seq("g"))
    Thread.sleep(1100) // manifest mtimes can be second-granular
    val mark = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    Thread.sleep(1100)
    Layout.upsertVersionedRows(spark, root, rows((2L, "a", 20L)), Seq("id"))
    // feeds only, starting at the version live at `mark` (v0): the
    // snapshot is NOT re-emitted, only the post-mark commit streams
    StreamingOps.drainToParquet(
      spark.readStream.format("graft-changes")
        .option("path", root).option("keys", "id")
        .option("startingTimestamp", mark).load(),
      out, ckpt)
    assert(drained(out) == Set((2L, "a", 20L, "insert")))
    // both starting options together refuse
    val e = intercept[Exception] {
      spark.readStream.format("graft-changes")
        .option("path", root).option("keys", "id")
        .option("startingVersion", 0).option("startingTimestamp", mark)
        .load().schema
      StreamingOps.drainToParquet(
        spark.readStream.format("graft-changes")
          .option("path", root).option("keys", "id")
          .option("startingVersion", 0).option("startingTimestamp", mark)
          .load(), out + "2", ckpt + "2")
    }
    assert(e.getMessage.contains("not both") ||
      e.getCause != null && e.getCause.getMessage.contains("not both"))
  }

  test("startingTimestamp: at-the-instant commits stream; pre-history falls back") {
    val (root, out, ckpt) = mk("tsedge")
    // a timestamp BEFORE the table existed: snapshot-then-follow (every
    // row arrives as the initial snapshot) instead of a hard failure
    Layout.initVersionedManifest(rows((1L, "a", 10L)), root, Seq("g"))
    StreamingOps.drainToParquet(
      spark.readStream.format("graft-changes")
        .option("path", root).option("keys", "id")
        .option("startingTimestamp", "2000-01-01 00:00:00").load(),
      out, ckpt)
    assert(drained(out) == Set((1L, "a", 10L, "insert")))
    // resumed drains use the CHECKPOINT, never re-resolving the timestamp
    Layout.upsertVersionedRows(spark, root, rows((2L, "a", 20L)), Seq("id"))
    StreamingOps.drainToParquet(
      spark.readStream.format("graft-changes")
        .option("path", root).option("keys", "id")
        .option("startingTimestamp", "2000-01-01 00:00:00").load(),
      out, ckpt)
    assert(drained(out) == Set(
      (1L, "a", 10L, "insert"), (2L, "a", 20L, "insert")))
  }

  test("short name 'graft-changes' resolves via DataSourceRegister") {
    val (root, out, ckpt) = mk("short")
    Layout.initVersionedManifest(rows((7L, "a", 70L)), root, Seq("g"))
    val df = spark.readStream.format("graft-changes")
      .option("path", root).option("keys", "id").load()
    StreamingOps.drainToParquet(df, out, ckpt)
    assert(drained(out) == Set((7L, "a", 70L, "insert")))
  }

  test("option guards: missing path/keys and user schema refuse") {
    val (root, _, _) = mk("guards")
    Layout.initVersionedManifest(rows((1L, "a", 1L)), root, Seq("g"))
    // Spark 4 defers source resolution past load(); forcing the schema (or
    // starting the query) is what trips the option guards
    val e1 = intercept[Exception] {
      spark.readStream.format("graft-changes").option("keys", "id")
        .load().schema
    }
    assert(e1.getMessage.contains("path"))
    val e2 = intercept[Exception] {
      StreamingOps.drainToParquet(
        spark.readStream.format("graft-changes").option("path", root).load(),
        root + "_out", root + "_ckpt")
    }
    assert(e2.getMessage.contains("keys"))
  }

  test("maxVersionsPerBatch bounds each batch's version span (backlog drain)") {
    val (root, out, ckpt) = mk("rate")
    Layout.initVersionedManifest(rows((0L, "a", 0L)), root, Seq("g"))
    // a 6-commit backlog before the stream ever starts
    (1 to 6).foreach(i =>
      Layout.upsertVersionedRows(spark, root, rows((i.toLong, "a", i.toLong)),
        Seq("id")))
    def drainOnce(): Unit = StreamingOps.drainToParquet(
      spark.readStream.format("graft-changes")
        .option("path", root).option("keys", "id")
        .option("startingVersion", 0).option("maxVersionsPerBatch", 2).load(),
      out, ckpt)
    // SupportsTriggerAvailableNow (r12): ONE AvailableNow run drains the
    // WHOLE backlog — as a sequence of ≤2-version micro-batches, never
    // one unbounded feed plan (the offsets log below proves the pacing)
    drainOnce()
    assert(drained(out) == (1 to 6).map(i =>
      (i.toLong, "a", i.toLong, "insert")).toSet)
    val batches = new java.io.File(ckpt + "/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 3, s"expected >= 3 capped micro-batches, got $batches")
    drainOnce() // already caught up: no-op
    assert(spark.read.parquet(out).count() == 6)
  }

  test("10-commit backlog, cap 2, ONE AvailableNow run: fully caught up") {
    val (root, out, ckpt) = mk("an10")
    Layout.initVersionedManifest(rows((0L, "a", 0L)), root, Seq("g"))
    (1 to 10).foreach(i =>
      Layout.upsertVersionedRows(spark, root, rows((i.toLong, "a", i.toLong)),
        Seq("id")))
    StreamingOps.drainToParquet(
      spark.readStream.format("graft-changes")
        .option("path", root).option("keys", "id")
        .option("startingVersion", 0).option("maxVersionsPerBatch", 2).load(),
      out, ckpt)
    assert(drained(out) == (1 to 10).map(i =>
      (i.toLong, "a", i.toLong, "insert")).toSet)
    // ≥ 5 bounded batches — the cap held while the one-shot run caught up
    val batches = new java.io.File(ckpt + "/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 5, s"expected >= 5 capped micro-batches, got $batches")
  }

  test("end-to-end: a sum view maintained from the stream ≡ the live table") {
    val (root, _, ckpt) = mk("view")
    Layout.initVersionedManifest(
      rows((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)), root, Seq("g"))
    // view state: snapshot batch materializes, feed batches fold
    var state: Option[org.apache.spark.sql.DataFrame] = None
    def drainIntoView(): Unit = {
      val q = StreamingOps.readChangeStream(spark, root, Seq("id"))
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            val snap = batch.drop("_change_type")
            state = Some(state match {
              case None => Incremental.materialize(snap, Seq("g"), Seq("v"))
              case Some(st) =>
                Incremental.applyFeed(st, batch, Seq("g"), Seq("v"))
            })
            state.foreach(_.persist().count()) // pin across batches
          }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainIntoView()
    Layout.upsertVersionedRows(spark, root,
      rows((1L, "a", 100L), (4L, "b", 40L)), Seq("id"))
    Layout.deleteVersionedRows(spark, root, $"id" === 2L)
    drainIntoView()
    val got = state.get.select($"g", $"n_rows", $"sum_v".cast("long"))
      .as[(String, Long, Long)].collect().toSet
    val want = Layout.readCurrent(spark, root).groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
    assert(want == Set(("a", 1L, 100L), ("b", 2L, 70L)))
  }

  test("a widenColumn under a RUNNING stream fails loudly, never truncates") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val (root, _, _) = mk("widen")
    // v starts INT so it can widen to LONG mid-stream
    Layout.initVersionedManifest(
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "g", "v"), root, Seq("g"))
    val src = new graft.streaming.GraftChangeSource(
      spark, root, Seq("id"), startingVersion = Some(0))
    // schema pinned at stream start: v int
    assert(src.schema("v").dataType ==
      org.apache.spark.sql.types.IntegerType)
    Layout.widenColumn(spark, root, "v", org.apache.spark.sql.types.LongType)
    Layout.upsertVersionedRows(spark, root,
      Seq((1L, "a", 3000000000L)).toDF("id", "g", "v"), Seq("id"))
    // the next batch carries LONG values — casting down to the pinned INT
    // would silently overflow under non-ANSI mode (ADVICE r11): refuse
    val e = intercept[IllegalArgumentException] {
      src.getBatch(Some(LongOffset(0L)),
        LongOffset(Layout.currentVersionNumber(spark, root).toLong))
    }
    assert(e.getMessage.contains("changed type"), e.getMessage)
    // a FRESH stream (restart) pins the widened schema and serves the feed
    val fresh = new graft.streaming.GraftChangeSource(
      spark, root, Seq("id"), startingVersion = Some(0))
    assert(fresh.schema("v").dataType ==
      org.apache.spark.sql.types.LongType)
    val cur = Layout.currentVersionNumber(spark, root)
    val batch = fresh.getBatch(Some(LongOffset(1L)), LongOffset(cur.toLong))
    assert(batch.schema("v").dataType ==
      org.apache.spark.sql.types.LongType) // aligned, no narrowing
    // the underlying feed carries the wide value intact
    assert(Layout.changeFeed(spark, root, 1, cur, Seq("id"))
      .filter($"_change_type" === "update_post")
      .select($"v").as[Long].collect().toSeq == Seq(3000000000L))
  }

  test("S75 kill-resume: watermarked dedup + windowed agg over the change " +
      "stream into a replace sink survives a restart exactly-once") {
    val base = Files.createTempDirectory("graft_cs_killres").toString
    val (src, res, ckpt) = (base + "/src", base + "/res", base + "/ckpt")
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    def srcRows(rs: (Long, java.sql.Timestamp, String, Long)*) =
      rs.toDF("id", "ts", "g", "v")
    Layout.initVersionedManifest(
      srcRows((1L, ts(10, 5), "a", 10L), (2L, ts(10, 20), "a", 20L),
        (3L, ts(11, 10), "b", 30L)), src, Seq("g"))
    Layout.initVersionedManifest(
      Seq((ts(0,0), ts(0,0), "z", 0L, 0L)).toDF("ws", "we", "g", "n_rows", "sum_v")
        .filter(lit(false)), res, Seq("g"))

    // the pipeline: inserts only → event-time watermark → per-id dedup
    // within the watermark → hourly windowed aggregate → complete-output
    // replace sink. Every drain below is a FRESH query over the same
    // checkpoint — the kill/restart path: state-store recovery (dedup
    // keys + window state), source offset replay, and the replace sink's
    // natural idempotency must compose to exactly-once.
    def drain(): Unit = {
      val q = spark.readStream.format("graft-changes")
        .option("path", src).option("keys", "id")
        .option("maxVersionsPerBatch", "1").load()
        .filter($"_change_type" === "insert")
        .select($"id", $"ts", $"g", $"v")
        .withWatermark("ts", "6 hours")
        .dropDuplicatesWithinWatermark("id")
        .groupBy(window($"ts", "1 hour"), $"g")
        .agg(count(lit(1)).as("n_rows"), sum($"v").as("sum_v"))
        .select($"window.start".as("ws"), $"window.end".as("we"),
          $"g", $"n_rows", $"sum_v")
        .writeStream.format("graft-sink")
        .option("path", res).option("mode", "replace")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain() // snapshot batch
    def result(): Set[(String, String, Long, Long)] =
      Layout.readCurrent(spark, res)
        .select($"ws".cast("string"), $"g", $"n_rows", $"sum_v")
        .as[(String, String, Long, Long)].collect()
        .map(r => (r._1, r._2, r._3, r._4)).toSet
    assert(result() == Set(
      ("2026-01-01 10:00:00", "a", 2L, 30L),
      ("2026-01-01 11:00:00", "b", 1L, 30L)))

    // "kill": the query is gone. New commits land, INCLUDING exact
    // replays of ids 2 and 3 (an at-least-once upstream) and a fresh id —
    // three versions so the restarted drain crosses several batches
    // (maxVersionsPerBatch = 1) with state carried between them
    Layout.appendVersionedRows(spark, src,
      srcRows((2L, ts(10, 20), "a", 20L), (3L, ts(11, 10), "b", 30L)))
    Layout.appendVersionedRows(spark, src, srcRows((4L, ts(11, 40), "b", 40L)))
    Layout.appendVersionedRows(spark, src,
      srcRows((4L, ts(11, 40), "b", 40L), (5L, ts(12, 5), "a", 50L)))
    drain() // restart from checkpoint
    // exactly-once: replayed ids deduped by the RECOVERED state store,
    // every unique id counted exactly once
    assert(result() == Set(
      ("2026-01-01 10:00:00", "a", 2L, 30L),
      ("2026-01-01 11:00:00", "b", 2L, 70L),
      ("2026-01-01 12:00:00", "a", 1L, 50L)))
    // and the batch oracle agrees: distinct-by-id rows of the source
    val want = Layout.readCurrent(spark, src)
      .dropDuplicates("id")
      .groupBy(window($"ts", "1 hour"), $"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .select($"window.start".cast("string"), $"g", $"n", $"s".cast("long"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(result() == want)
  }
}
