package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.Sessionize

/** Gap-based sessionization: hand-computed session boundaries, the
  * boundary-inclusive convention, tie determinism, null hygiene,
  * partitioning invariance, single-Window plan shape.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val hand = Seq(
    (1L, ts(0)), (1L, ts(10)), (1L, ts(100)), (1L, ts(101)), (1L, ts(500)),
    (2L, ts(0)), (2L, ts(1000))
  ).toDF("user_id", "ts")

  test("sessionize: hand case — gaps > 50s split, runs stay (r15)") {
    val got = Sessionize.sessionize(hand, "user_id", "ts", gapSeconds = 50)
      .select("user_id", "ts", "session_seq").as[(Long, Timestamp, Long)]
      .collect().map { case (u, t, s) => (u, t.getTime / 1000, s) }.toSet
    assert(got == Set(
      (1L, 0L, 1L), (1L, 10L, 1L), (1L, 100L, 2L), (1L, 101L, 2L),
      (1L, 500L, 3L),
      (2L, 0L, 1L), (2L, 1000L, 2L)))
  }

  test("sessionize: a gap of EXACTLY gapSeconds continues the session") {
    val df = Seq((1L, ts(0)), (1L, ts(50)), (1L, ts(101))).toDF("user_id", "ts")
    val seqs = Sessionize.sessionize(df, "user_id", "ts", gapSeconds = 50)
      .orderBy("ts").select("session_seq").as[Long].collect().toSeq
    // 0→50 is exactly the gap (stays); 50→101 is 51s (splits)
    assert(seqs == Seq(1L, 1L, 2L))
  }

  test("sessionize: tied timestamps land in ONE session, any order") {
    val df = Seq((1L, ts(0)), (1L, ts(1000)), (1L, ts(1000)), (1L, ts(1000)))
      .toDF("user_id", "ts")
    val rows = Sessionize.sessionize(df, "user_id", "ts", gapSeconds = 10)
      .select("ts", "session_seq").as[(Timestamp, Long)].collect()
    assert(rows.filter(_._1.getTime == 0).map(_._2).toSeq == Seq(1L))
    assert(rows.filter(_._1.getTime == 1000000).map(_._2).toSet == Set(2L))
  }

  test("sessionize: null entity / null ts rows are dropped") {
    val df = Seq(
      (Some(1L), Some(ts(0))), (None, Some(ts(5))), (Some(1L), None)
    ).toDF("user_id", "ts")
    assert(Sessionize.sessionize(df, "user_id", "ts", 50).count() == 1)
  }

  test("sessionStats: counts, bounds, exact µs duration (r15)") {
    val got = Sessionize.sessionStats(hand, "user_id", "ts", gapSeconds = 50)
      .select("user_id", "session_seq", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 2L, 10000000L), (1L, 2L, 2L, 1000000L), (1L, 3L, 1L, 0L),
      (2L, 1L, 1L, 0L), (2L, 2L, 1L, 0L)))
  }

  test("sessionize: partitioning invariance") {
    val base = Sessionize.sessionStats(hand, "user_id", "ts", 50)
      .collect().toSet
    val shuffled = Sessionize.sessionStats(
      hand.repartition(7, col("ts")), "user_id", "ts", 50).collect().toSet
    assert(base == shuffled)
  }

  test("batch sessionize ≡ streaming Sessionize: every closed streaming " +
      "session is a batch session; batch adds exactly the open tails") {
    import graft.streaming.{Sessionize => SSess, StreamingOps}
    import graft.streaming.Sessionize.Event
    val min = 60L * 1000000
    val rnd = new scala.util.Random(19)
    val events = for (u <- 1L to 5L; _ <- 1 to 30) yield
      Event(u, rnd.nextInt(3000).toLong * min, 1.0)
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_par").toString
    events.toDF().write.mode("overwrite").parquet(dir)
    val stream = StreamingOps.fileStream(spark, dir,
      Seq.empty[Event].toDS().schema).as[Event]
    StreamingOps.drainToMemory(
      SSess(stream, gapMicros = 30 * min).toDF, "graft_sess_parity")
    val closed = spark.table("graft_sess_parity").as[SSess.Session]
      .collect().map(s => (s.user_id, s.startMicros, s.endMicros, s.n_events))
      .toSet
    val batch = Sessionize.sessionStats(
      events.toDF().select(col("user_id"),
        expr("cast(timestamp_micros(tsMicros) as timestamp_ntz)").as("ts")),
      "user_id", "ts", gapSeconds = 30 * 60)
      .select(col("user_id"), unix_micros(col("start_ts")),
        unix_micros(col("end_ts")), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(closed.subsetOf(batch),
      s"streaming closed sessions missing from batch: ${closed.diff(batch)}")
    // per user the batch sees one extra session — the open tail
    val closedPerUser = closed.groupBy(_._1).view.mapValues(_.size).toMap
    val batchPerUser = batch.groupBy(_._1).view.mapValues(_.size).toMap
    (1L to 5L).foreach { u =>
      assert(batchPerUser(u) == closedPerUser.getOrElse(u, 0) + 1,
        s"user $u: batch ${batchPerUser(u)} vs closed ${closedPerUser.get(u)}")
    }
  }

  test("plan: two Window passes share ONE sort and ONE shuffle") {
    val df = Sessionize.sessionize(hand, "user_id", "ts", 50)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val windows = p.linesIterator.count(l =>
      l.trim.startsWith("+- Window ") || l.trim.startsWith("Window "))
    val sorts = p.linesIterator.count(_.contains(" Sort "))
    val exchanges = p.linesIterator.count(_.contains("Exchange "))
    assert(windows == 2, s"expected two Window nodes, plan:\n$p")
    assert(sorts == 1, s"second window must reuse the sort, plan:\n$p")
    assert(exchanges == 1, s"one entity-grain shuffle only, plan:\n$p")
  }
}
