package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Layout, ManifestIndex}

/** Round-10 merge-on-read UPSERT (`Layout.upsertVersionedRows`): keyed
  * MERGE where matched old images are DV'd out and every update row is
  * appended — O(|updates|) bytes written regardless of how many files the
  * matched keys are scattered across. Pins: content equivalence with the
  * copy-on-write merge, no-rewrite entry identity, partition moves,
  * DV accumulation, constraints, widening, feeds, and the contract edges.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def mkRoot(tag: String): (String, DataFrame) = {
    val root = Files.createTempDirectory(s"graft_upsert_$tag").toString + "/t"
    val df = spark.range(100)
      .select($"id", ($"id" * 10).cast("double").as("v"),
        concat(lit("p"), ($"id" % 4).cast("string")).as("part"))
    Layout.initVersionedManifest(df.repartitionByRange(4, $"id"), root, Seq("part"))
    (root, df)
  }

  private def updatesBatch = Seq(
    (7L, 700.5, "p3"),     // update in place
    (12L, 1.0, "p0"),      // update in place
    (500L, 5.0, "p1"),     // brand-new key
    (21L, 2.0, "p0")       // PARTITION MOVE: 21 lives in p1 (21 % 4 = 1)
  ).toDF("id", "v", "part")

  test("upsert content ≡ copy-on-write merge; old files never rewritten") {
    val (rowRoot, _) = mkRoot("mor")
    val (cowRoot, _) = mkRoot("cow")
    val before = ManifestIndex.read(spark, rowRoot, "v00000")
    Layout.upsertVersionedRows(spark, rowRoot, updatesBatch, Seq("id"))
    // the copy-on-write merge CANNOT move a key across partitions (its
    // documented stale-row caveat), so compare on the no-move subset...
    Layout.mergeVersionedPartitioned(spark, cowRoot,
      updatesBatch.filter($"id" =!= 21L), Seq("id"), "part")
    val mor = Layout.readCurrent(spark, rowRoot)
      .filter($"id" =!= 21L).collect().toSet
    val cow = Layout.readCurrent(spark, cowRoot)
      .filter($"id" =!= 21L).collect().toSet
    assert(mor == cow)
    // ...and pin the move the row-level path gets RIGHT: exactly one row
    // for key 21, in its new partition
    val moved = Layout.readCurrent(spark, rowRoot).filter($"id" === 21L)
      .select($"part", $"v").as[(String, Double)].collect().toSeq
    assert(moved == Seq(("p0", 2.0)))
    // no prior data file rewritten: every v00000 entry survives by
    // (path, size), touched ones only gaining a DV reference
    val after = ManifestIndex.read(spark, rowRoot, "v00001")
    val beforeFiles = before.entries.map(e => (e.path, e.size)).toSet
    val carried = after.entries.filter(e => e.path.startsWith("v00000/"))
    assert(carried.map(e => (e.path, e.size)).toSet == beforeFiles)
    assert(carried.exists(_.dv.isDefined))
    assert(after.entries.exists(_.path.startsWith("v00001/")), "appended images")
    // row count: 100 live - 3 replaced + 4 incoming = 101
    assert(Layout.countRows(spark, rowRoot).contains(101L))
  }

  test("upserts accumulate over prior row-level deletes") {
    val (root, _) = mkRoot("acc")
    Layout.deleteVersionedRows(spark, root, $"id" % 10 === 0) // 10 gone
    Layout.upsertVersionedRows(spark, root,
      Seq((20L, -1.0, "p0"), (3L, -3.0, "p3")).toDF("id", "v", "part"),
      Seq("id"))
    val cur = Layout.readCurrent(spark, root)
    // 90 survivors; 20 was DELETED so its upsert is an INSERT (+1); the
    // replacement of 3 is count-neutral
    assert(cur.count() == 91L)
    assert(cur.filter($"id" === 20L).select($"v").as[Double].head() == -1.0)
    assert(cur.filter($"id" === 3L).select($"v").as[Double].head() == -3.0)
    assert(cur.filter($"id" === 30L).count() == 0L, "prior delete persists")
  }

  test("change feed across an upsert: update_pre/update_post + insert") {
    val (root, _) = mkRoot("feed")
    Layout.upsertVersionedRows(spark, root,
      Seq((7L, 700.5, "p3"), (500L, 5.0, "p1")).toDF("id", "v", "part"),
      Seq("id"))
    val feed = Layout.changeFeed(spark, root, 0, 1, Seq("id"))
      .select($"_change_type", $"id", $"v").as[(String, Long, Double)]
      .collect().toSet
    assert(feed == Set(("update_pre", 7L, 70.0), ("update_post", 7L, 700.5),
      ("insert", 500L, 5.0)))
  }

  test("CHECK constraints gate the incoming rows before any version exists") {
    val (root, _) = mkRoot("chk")
    Layout.addCheckConstraint(spark, root, "v_small", "v < 10000")
    val versions = Layout.history(spark, root).count()
    intercept[IllegalArgumentException](
      Layout.upsertVersionedRows(spark, root,
        Seq((7L, 99999.0, "p3")).toDF("id", "v", "part"), Seq("id")))
    assert(Layout.history(spark, root).count() == versions,
      "a rejected upsert must not claim a version")
  }

  test("widening composes: narrow producers keep working after widenColumn") {
    val root = Files.createTempDirectory("graft_upsert_widen").toString + "/t"
    val df = spark.range(100)
      .select($"id".cast("int").as("id"), ($"id" * 10).cast("double").as("v"),
        concat(lit("p"), ($"id" % 4).cast("string")).as("part"))
    Layout.initVersionedManifest(df.repartitionByRange(4, $"id"), root, Seq("part"))
    Layout.widenColumn(spark, root, "id", LongType)
    // the producer still sends int ids — upcast at the door; and a wide
    // key no int can hold lands in the same batch
    Layout.upsertVersionedRows(spark, root,
      Seq((7, 700.5, "p3")).toDF("id", "v", "part")
        .withColumn("id", $"id".cast("int"))
        .unionByName(Seq((6_000_000_000L, 6.0, "p1")).toDF("id", "v", "part")),
      Seq("id"))
    val cur = Layout.readCurrent(spark, root)
    assert(cur.schema("id").dataType == LongType)
    assert(cur.filter($"id" === 7L).select($"v").as[Double].head() == 700.5)
    assert(cur.filter($"id" === 6_000_000_000L).count() == 1L)
    assert(cur.count() == 101L)
  }

  test("txn watermark: a replayed batch commits exactly once") {
    val (root, _) = mkRoot("txn")
    def batch(v: Double) = Seq((7L, v, "p3")).toDF("id", "v", "part")
    def versions() = Layout.history(spark, root).count()
    Layout.upsertVersionedRows(spark, root, batch(1.0), Seq("id"),
      txn = Some(("appA", 0L)))
    val afterFirst = versions()
    // exact replay (crash between table commit and checkpoint commit):
    // skipped without touching the batch, no version claimed
    Layout.upsertVersionedRows(spark, root, batch(666.0), Seq("id"),
      txn = Some(("appA", 0L)))
    assert(versions() == afterFirst, "replay must not commit")
    assert(Layout.readCurrent(spark, root).filter($"id" === 7L)
      .select($"v").as[Double].head() == 1.0, "replay payload ignored")
    // the watermark SURVIVES an interleaved writer's carry
    Layout.mergeVersionedPartitioned(spark, root,
      Seq((8L, 8.0, "p0")).toDF("id", "v", "part"), Seq("id"), "part")
    Layout.upsertVersionedRows(spark, root, batch(667.0), Seq("id"),
      txn = Some(("appA", 0L)))
    assert(Layout.readCurrent(spark, root).filter($"id" === 7L)
      .select($"v").as[Double].head() == 1.0)
    // a NEW batch id applies; an independent app is unaffected by A's marks
    Layout.upsertVersionedRows(spark, root, batch(2.0), Seq("id"),
      txn = Some(("appA", 1L)))
    assert(Layout.readCurrent(spark, root).filter($"id" === 7L)
      .select($"v").as[Double].head() == 2.0)
    Layout.upsertVersionedRows(spark, root, batch(3.0), Seq("id"),
      txn = Some(("appB", 0L)))
    assert(Layout.readCurrent(spark, root).filter($"id" === 7L)
      .select($"v").as[Double].head() == 3.0)
  }

  test("upsert composes with column mapping: writes under the renamed name") {
    val (root, _) = mkRoot("rename")
    Layout.renameColumn(spark, root, "v", "price")
    Layout.upsertVersionedRows(spark, root,
      Seq((7L, 700.5, "p3"), (500L, 5.0, "p1")).toDF("id", "price", "part"),
      Seq("id"))
    val cur = Layout.readCurrent(spark, root)
    assert(cur.columns.toSeq.sorted == Seq("id", "part", "price"))
    assert(cur.filter($"id" === 7L).select($"price").as[Double].head() == 700.5)
    assert(cur.count() == 101L)
    // the OLD name is rejected (the schema contract speaks logical names)
    intercept[IllegalArgumentException](
      Layout.upsertVersionedRows(spark, root,
        Seq((1L, 1.0, "p1")).toDF("id", "v", "part"), Seq("id")))
    // feed across rename + upsert: only the genuine changes, new names
    val feed = Layout.changeFeed(spark, root, 0, 2, Seq("id"))
      .select($"_change_type", $"id", $"price")
      .as[(String, Long, Double)].collect().toSet
    assert(feed == Set(("update_pre", 7L, 70.0), ("update_post", 7L, 700.5),
      ("insert", 500L, 5.0)))
  }

  test("contract edges: empty no-op, schema must match exactly") {
    val (root, df) = mkRoot("edges")
    val cur = Layout.upsertVersionedRows(spark, root,
      df.filter(lit(false)), Seq("id"))
    assert(cur.endsWith("v00000"), "empty upsert claims no version")
    intercept[IllegalArgumentException]( // missing column
      Layout.upsertVersionedRows(spark, root,
        Seq((1L, "p1")).toDF("id", "part"), Seq("id")))
    intercept[IllegalArgumentException]( // extra column = evolution
      Layout.upsertVersionedRows(spark, root,
        Seq((1L, 1.0, "x", "p1")).toDF("id", "v", "extra", "part"), Seq("id")))
  }
}
