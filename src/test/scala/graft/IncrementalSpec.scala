package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Incremental
import graft.sources.Layout

/** Incremental materialized-aggregate maintenance over the change feed:
  * folding feeds v0→v1→…→vN must equal materializing vN from scratch,
  * across a random merge/delete history (round 9).
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("g")
  private val sums = Seq("v")

  private def canon(df: DataFrame): Set[(String, Long, Long)] =
    df.select($"g", $"n_rows", $"sum_v").as[(String, Long, Long)]
      .collect().toSet

  test("folding the feed chain equals full recompute over a random history") {
    val rnd = new scala.util.Random(4242)
    val root = Files.createTempDirectory("graft_ivm").toString
    def rows(rs: (Long, String, Long)*) = rs.toDF("id", "g", "v")
    val init = (1L to 40L).map(i => (i, s"g${i % 5}", rnd.nextInt(100).toLong))
    Layout.initVersionedPartitioned(rows(init: _*), root, "g")

    var state = Incremental.materialize(
      Layout.readVersion(spark, root, 0), keys, sums)
    var version = 0
    (1 to 6).foreach { _ =>
      if (rnd.nextBoolean()) {
        // merge: a mix of updates to existing ids and fresh inserts
        val ups = (1 to 1 + rnd.nextInt(6)).map { _ =>
          val id = 1L + rnd.nextInt(50)
          (id, s"g${id % 5}", rnd.nextInt(100).toLong)
        }
        Layout.mergeVersionedPartitioned(spark, root, rows(ups: _*), Seq("id"), "g")
      } else {
        val cut = 1L + rnd.nextInt(50)
        Layout.deleteVersionedPartitioned(spark, root,
          col("id") % 7 === cut % 7 && col("id") <= cut, "g")
      }
      val feed = Layout.changeFeed(spark, root, version, version + 1, Seq("id"))
      state = Incremental.applyFeed(state, feed, keys, sums)
      version += 1
      val full = Incremental.materialize(
        Layout.readVersion(spark, root, version), keys, sums)
      assert(canon(state) == canon(full),
        s"incremental state diverged from recompute at v$version")
    }
    assert(version == 6)
  }

  test("groups emptied by deletes leave no tombstone rows in the state") {
    val a = Seq((1L, "g1", 5L), (2L, "g2", 7L)).toDF("id", "g", "v")
    val state = Incremental.materialize(a, keys, sums)
    // feed deleting every g2 row
    val feed = Seq((2L, "g2", 7L, "delete")).toDF("id", "g", "v", "_change_type")
    val next = Incremental.applyFeed(state, feed, keys, sums)
    assert(canon(next) == Set(("g1", 1L, 5L)))
  }

  test("update feeds move sums by exactly the value delta; nulls sum as 0") {
    val a = Seq((1L, "g1", 5L), (2L, "g1", 7L)).toDF("id", "g", "v")
    val state = Incremental.materialize(a, keys, sums)
    val feed = Seq(
      (2L, "g1", Some(7L), "update_pre"),
      (2L, "g1", Some(20L), "update_post"),
      (3L, "g1", None: Option[Long], "insert"))
      .toDF("id", "g", "v", "_change_type")
    val next = Incremental.applyFeed(state, feed, keys, sums)
    assert(canon(next) == Set(("g1", 3L, 25L))) // 5 + 20 + 0(null)
  }
}
