package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Layout, ManifestIndex}

/** `Layout.maintain` (r11): purge → compact → vacuum composed under OCC,
  * on a table carrying deletion vectors + fragmented leaves + pending
  * renames at once. Pins: content invariance, physical convergence (no
  * DVs, coalesced leaves, healed stats/blooms), idempotence (second run
  * all-zero, no version claimed), and policy toggles.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int) = (1 to n).map(i =>
    (i.toLong, s"p${i % 2}", i.toDouble)).toDF("id", "part", "v")

  /** A worked-over manifest table: 5 fragment-accreting upserts, a DV
    * delete, and a pending column rename.
    */
  private def workedOver(): String = {
    val root = Files.createTempDirectory("graft_maint").toString + "/t"
    Layout.initVersionedManifest(rows(200).coalesce(1), root, Seq("part"))
    (1 to 5).foreach { k =>
      Layout.upsertVersionedRows(spark, root,
        (1 to 10).map(i => ((200 + k * 10 + i).toLong, "p1",
          i.toDouble)).toDF("id", "part", "v"), Seq("id"))
    }
    // DVs land on p0 only, fragments accrete on p1 only — so purge and
    // compact each have distinct work to do in one maintain run
    Layout.deleteVersionedRows(spark, root, $"part" === "p0" && $"id" % 9 === 0)
    Layout.renameColumn(spark, root, "v", "value")
    root
  }

  private def state(root: String): Set[(Long, String, Double)] =
    Layout.readCurrent(spark, root).select($"id", $"part", $"value")
      .as[(Long, String, Double)].collect().toSet

  test("maintain converges DVs + fragments + renames in one run; content intact") {
    val root = workedOver()
    val before = state(root)
    val m0 = ManifestIndex.read(spark, root,
      f"v${Layout.currentVersionNumber(spark, root)}%05d")
    assert(m0.entries.exists(_.dv.isDefined), "setup must carry DVs")
    assert(m0.byLeaf.exists(_._2.size > 3), "setup must be fragmented")
    val r = Layout.maintain(spark, root,
      Layout.MaintenancePolicy(maxFiles = 3, keepVersions = 2))
    assert(r.purgedLeaves >= 1 && r.compactedLeaves >= 1)
    assert(state(root) == before, "maintenance must not change content")
    val m1 = ManifestIndex.read(spark, root,
      f"v${Layout.currentVersionNumber(spark, root)}%05d")
    assert(m1.entries.forall(_.dv.isEmpty), "no DV survives a purge")
    assert(m1.byLeaf.forall(_._2.size <= 3), "no leaf stays fragmented")
    // stats self-healed: every live entry has fresh envelopes
    assert(m1.entries.forall(_.stats.isDefined))
    // the pending rename is still served correctly through the mapping
    assert(Layout.readCurrent(spark, root).columns.contains("value"))
  }

  test("maintain is idempotent: the second run is an all-zero no-op") {
    val root = workedOver()
    Layout.maintain(spark, root, Layout.MaintenancePolicy(maxFiles = 3))
    val vAfterFirst = Layout.currentVersionNumber(spark, root)
    val before = state(root)
    val r2 = Layout.maintain(spark, root, Layout.MaintenancePolicy(maxFiles = 3))
    assert(r2.purgedLeaves == 0 && r2.compactedLeaves == 0 &&
      r2.vacuumedVersions == 0, r2.toString)
    assert(Layout.currentVersionNumber(spark, root) == vAfterFirst,
      "an idle maintenance run must claim no version")
    assert(state(root) == before)
  }

  test("vacuum step reclaims history beyond keepVersions; live state survives") {
    val root = workedOver()
    val before = state(root)
    val r = Layout.maintain(spark, root,
      Layout.MaintenancePolicy(maxFiles = 3, keepVersions = 1))
    assert(r.vacuumedVersions >= 1)
    assert(state(root) == before)
  }

  test("policy toggles: purge/compact/vacuum can each be disabled") {
    val root = workedOver()
    val v0 = Layout.currentVersionNumber(spark, root)
    val r = Layout.maintain(spark, root, Layout.MaintenancePolicy(
      purge = false, compact = false, vacuum = false))
    assert(r == Layout.MaintenanceReport(0, 0, 0, r.livePath))
    assert(Layout.currentVersionNumber(spark, root) == v0)
    // DVs untouched when purge is off
    val m = ManifestIndex.read(spark, root, f"v$v0%05d")
    assert(m.entries.exists(_.dv.isDefined))
  }

  test("maintain compacts FLAT (unpartitioned) roots too; idle run no-ops") {
    val root = Files.createTempDirectory("graft_maint_flat").toString
    Layout.initVersioned(rows(50).drop("part").repartition(6), root)
    (1 to 3).foreach(k => Layout.mergeVersioned(spark, root,
      Seq(((100 + k).toLong, k.toDouble)).toDF("id", "v"), Seq("id")))
    val before = Layout.readCurrent(spark, root)
      .select($"id", $"v").as[(Long, Double)].collect().toSet
    // tiny average file size trips the fragmentation test → flat rewrite
    val r = Layout.maintain(spark, root,
      Layout.MaintenancePolicy(maxFiles = 2, keepVersions = 2))
    assert(r.compactedLeaves == 1, r.toString)
    assert(Layout.readCurrent(spark, root)
      .select($"id", $"v").as[(Long, Double)].collect().toSet == before)
    // converged: the next run claims no version
    val v = Layout.currentVersionNumber(spark, root)
    val r2 = Layout.maintain(spark, root,
      Layout.MaintenancePolicy(maxFiles = 2, keepVersions = 2))
    assert(r2.compactedLeaves == 0)
    assert(Layout.currentVersionNumber(spark, root) == v)
  }

  test("a leaf legitimately needing > maxFiles files converges, not oscillates") {
    val root = Files.createTempDirectory("graft_maint_big").toString + "/t"
    // one leaf, 6 files; pick targetBytes = bytes/3 so the rewrite yields
    // ~3 files — MORE than maxFiles=2. The old gate (count > maxFiles)
    // re-flagged the healthy 3-file leaf forever (review fix).
    val df = (1 to 600).map(i => (i.toLong, "p0", i.toDouble))
      .toDF("id", "part", "v")
    Layout.initVersionedManifest(df.repartition(6), root, Seq("part"))
    val m0 = graft.sources.ManifestIndex.read(spark, root, "v00000")
    val bytes = m0.entries.map(_.size).sum
    val policy = Layout.MaintenancePolicy(
      targetBytes = math.max(1L, bytes / 3), maxFiles = 2, keepVersions = 100)
    val r1 = Layout.maintain(spark, root, policy)
    assert(r1.compactedLeaves == 1, r1.toString)
    val v = Layout.currentVersionNumber(spark, root)
    val r2 = Layout.maintain(spark, root, policy)
    assert(r2.compactedLeaves == 0,
      s"second run must accept the first run's output: $r2")
    assert(Layout.currentVersionNumber(spark, root) == v)
  }

  test("maintain works on a HARDLINK root too (no purge; compact no-ops clean)") {
    val root = Files.createTempDirectory("graft_maint_hl").toString
    // fan-out is opt-in under the optimized-write default (one file per
    // touched leaf per commit) — this root needs a fragmented leaf
    spark.conf.set("graft.write.filesPerLeaf", "4")
    try {
      Layout.initVersionedPartitioned(rows(50), root, "part")
      (1 to 4).foreach(k => Layout.mergeVersionedPartitioned(spark, root,
        Seq(((100 + k).toLong, "p1", k.toDouble)).toDF("id", "part", "v"),
        Seq("id"), "part"))
    } finally spark.conf.unset("graft.write.filesPerLeaf")
    val before = Layout.readCurrent(spark, root)
      .select($"id", $"part", $"v").as[(Long, String, Double)].collect().toSet
    val r = Layout.maintain(spark, root,
      Layout.MaintenancePolicy(maxFiles = 2, keepVersions = 2))
    assert(r.compactedLeaves >= 1 && r.purgedLeaves == 0)
    assert(Layout.readCurrent(spark, root)
      .select($"id", $"part", $"v").as[(Long, String, Double)]
      .collect().toSet == before)
    // hardlink-mode idle compaction claims no version either (r11 fix)
    val v = Layout.currentVersionNumber(spark, root)
    val r2 = Layout.maintain(spark, root,
      Layout.MaintenancePolicy(maxFiles = 2, keepVersions = 2))
    assert(r2.compactedLeaves == 0)
    assert(Layout.currentVersionNumber(spark, root) == v)
  }
}
