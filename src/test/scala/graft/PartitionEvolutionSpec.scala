package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Layout, ManifestIndex}

/** Partition-spec evolution (round 10): `repartitionTable` is one
  * metadata commit; old leaves stay dir-encoded under their original spec
  * and the read path unions per-spec scans. Pins: mixed reads and time
  * travel, filters on both specs' columns, row-level DML across specs,
  * COW-writer refusal, compaction convergence, change feeds across the
  * evolution, and the rename/drop guards on dir-encoded columns.
  */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def rows(rs: (Long, String, String, Double)*) =
    rs.toDF("id", "region", "bucket", "v")

  /** 4 rows over region-partitioning, then evolve to bucket, then merge
    * two rows (one update, one insert) under the NEW spec.
    */
  private def evolved(): String = {
    val root = Files.createTempDirectory("graft_evo").toString
    Layout.initVersionedManifest(
      rows((1L, "eu", "b1", 10.0), (2L, "eu", "b2", 20.0),
        (3L, "us", "b1", 30.0), (4L, "us", "b2", 40.0)).coalesce(1),
      root, Seq("region"))
    Layout.repartitionTable(spark, root, Seq("bucket"))
    Layout.upsertVersionedRows(spark, root,
      rows((2L, "eu", "b2", 99.0), (5L, "ap", "b1", 50.0)), Seq("id"))
    root
  }

  private def state(root: String): Set[(Long, String, String, Double)] =
    Layout.readCurrent(spark, root)
      .select($"id", $"region", $"bucket", $"v")
      .as[(Long, String, String, Double)].collect().toSet

  test("metadata-only evolution: reads span both specs; no file rewritten") {
    val root = evolved()
    assert(state(root) == Set(
      (1L, "eu", "b1", 10.0), (2L, "eu", "b2", 99.0), (3L, "us", "b1", 30.0),
      (4L, "us", "b2", 40.0), (5L, "ap", "b1", 50.0)))
    // v0 files carried untouched; new images landed under bucket=…
    val m = ManifestIndex.read(spark, root,
      f"v${Layout.currentVersionNumber(spark, root)}%05d")
    val specs = m.entries.map(e => e.leaf.takeWhile(_ != '=')).toSet
    assert(specs == Set("region", "bucket"), m.entries.map(_.leaf))
    assert(m.entries.filter(_.leaf.startsWith("region="))
      .forall(_.path.startsWith("v00000/")))
    // time travel reads pre-evolution versions under their own spec
    assert(Layout.readVersion(spark, root, 0)
      .select($"id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
  }

  test("filters work against both specs (dir-pruned new, payload old)") {
    val root = evolved()
    val byBucket = Layout.readCurrent(spark, root).filter($"bucket" === "b1")
      .select($"id").as[Long].collect().toSet
    assert(byBucket == Set(1L, 3L, 5L))
    val byRegion = Layout.readCurrent(spark, root).filter($"region" === "eu")
      .select($"id").as[Long].collect().toSet
    assert(byRegion == Set(1L, 2L))
    val byBoth = Layout.readCurrent(spark, root)
      .filter($"region" === "us" && $"v" > 35.0)
      .select($"id").as[Long].collect().toSet
    assert(byBoth == Set(4L))
  }

  test("row-level DML works across specs; COW writers refuse until compaction") {
    val root = evolved()
    // delete a row living in an OLD-spec file (DV lands on a v00000 file)
    Layout.deleteVersionedRows(spark, root, $"id" === 3L)
    assert(state(root).map(_._1) == Set(1L, 2L, 4L, 5L))
    // MERGE INTO across both specs in one call
    Layout.mergeIntoVersionedRows(spark, root,
      rows((1L, "eu", "b1", 11.0), (6L, "eu", "b2", 60.0)), Seq("id"),
      whenMatchedUpdate = Some((lit(true), Map("v" -> col("src_v")))),
      whenNotMatchedInsert = Some(lit(true)))
    assert(state(root) == Set(
      (1L, "eu", "b1", 11.0), (2L, "eu", "b2", 99.0), (4L, "us", "b2", 40.0),
      (5L, "ap", "b1", 50.0), (6L, "eu", "b2", 60.0)))
    // the leaf-pruned copy-on-write writers refuse on the mixed layout
    val e1 = intercept[IllegalArgumentException] {
      Layout.mergeVersionedPartitioned(spark, root,
        rows((7L, "eu", "b1", 70.0)), Seq("id"), "bucket")
    }
    assert(e1.getMessage.contains("earlier partition spec"))
    val e2 = intercept[IllegalArgumentException] {
      Layout.deleteVersionedPartitioned(spark, root, $"id" === 1L, "bucket")
    }
    assert(e2.getMessage.contains("earlier partition spec"))
  }

  test("compaction re-specs old leaves; COW writers and rename work again") {
    val root = evolved()
    val before = state(root)
    val (_, rewritten) = Layout.compactVersionedPartitioned(
      spark, root, targetBytes = 128L << 20)
    assert(rewritten >= 2, s"expected the region leaves re-spec'd, got $rewritten")
    assert(state(root) == before, "re-spec must not change content")
    val m = ManifestIndex.read(spark, root,
      f"v${Layout.currentVersionNumber(spark, root)}%05d")
    assert(m.entries.forall(_.leaf.startsWith("bucket=")), m.entries.map(_.leaf))
    // converged: the leaf-pruned merge works again
    Layout.mergeVersionedPartitioned(spark, root,
      rows((7L, "eu", "b1", 70.0)), Seq("id"), "bucket")
    assert(state(root).map(_._1).contains(7L))
    // and region (now an ordinary data column) can be renamed
    Layout.renameColumn(spark, root, "region", "geo")
    assert(Layout.readCurrent(spark, root).columns.contains("geo"))
  }

  test("purge on a mixed layout re-specs touched old leaves, values intact") {
    val root = evolved()
    // DV a row in an OLD-spec (region=…) file, then purge: the rewrite
    // must re-land the leaf under the CURRENT spec with its payload
    // bucket values preserved (the leaf-to-leaf shape would have dropped
    // the bucket column and null-filled it on read — review fix)
    Layout.deleteVersionedRows(spark, root, $"id" === 1L)
    Layout.purgeDeletedRows(spark, root)
    assert(state(root) == Set(
      (2L, "eu", "b2", 99.0), (3L, "us", "b1", 30.0),
      (4L, "us", "b2", 40.0), (5L, "ap", "b1", 50.0)))
    assert(Layout.readCurrent(spark, root).filter($"bucket".isNull).isEmpty)
    // exportFileList refuses the still-mixed layout (raw files would lose
    // dir-encoded columns), then works after compaction converges it
    intercept[IllegalArgumentException] {
      Layout.exportFileList(spark, root, root + "/_export/files.txt")
    }
    Layout.compactVersionedPartitioned(spark, root, targetBytes = 128L << 20)
    assert(Layout.exportFileList(spark, root,
      root + "/_export/files.txt") > 0)
  }

  test("change feed across the evolution commit is empty; across DML is exact") {
    val root = evolved()
    // v0 -> v1 is the REPARTITION commit: entries unchanged, no changes
    assert(Layout.changeFeed(spark, root, 0, 1, Seq("id")).isEmpty)
    // v1 -> v2 is the upsert: one update pair + one insert
    val feed = Layout.changeFeed(spark, root, 1, 2, Seq("id"))
      .select($"id", $"v", $"_change_type").as[(Long, Double, String)]
      .collect().toSet
    assert(feed == Set((2L, 20.0, "update_pre"), (2L, 99.0, "update_post"),
      (5L, 50.0, "insert")))
  }

  test("change feed spanning the evolution commit AND later DML aligns moved columns") {
    val root = evolved()
    // v0 -> v2 crosses the repartition (bucket moved dataSchema -> spec,
    // region spec -> dataSchema) plus the upsert that DV'd an old-spec
    // leaf. The moved columns must align by PHYSICAL identity on the
    // from-side: before the fix, bucket was dropped from the from-side
    // projection, so every surviving row of the touched region=eu leaf
    // (id=1) emitted a spurious update pair with a null bucket pre-image
    // (ADVICE r10, high).
    val feed = Layout.changeFeed(spark, root, 0, 2, Seq("id"))
      .select($"id", $"region", $"bucket", $"v", $"_change_type")
      .as[(Long, String, String, Double, String)].collect().toSet
    assert(feed == Set(
      (2L, "eu", "b2", 20.0, "update_pre"),
      (2L, "eu", "b2", 99.0, "update_post"),
      (5L, "ap", "b1", 50.0, "insert")))
    // and the reverse direction inverts exactly (no spurious rows either way)
    val back = Layout.changeFeed(spark, root, 2, 0, Seq("id"))
      .select($"id", $"v", $"_change_type")
      .as[(Long, Double, String)].collect().toSet
    assert(back == Set((2L, 99.0, "update_pre"), (2L, 20.0, "update_post"),
      (5L, 50.0, "delete")))
  }

  test("respec compaction is invisible to the change feed; vacuum reclaims old dirs") {
    val root = evolved()
    val vBefore = Layout.currentVersionNumber(spark, root)
    Layout.compactVersionedPartitioned(spark, root, targetBytes = 128L << 20)
    val vAfter = Layout.currentVersionNumber(spark, root)
    // content-identical: the re-spec'd leaves diff by key to an EMPTY feed
    assert(Layout.changeFeed(spark, root, vBefore, vAfter, Seq("id")).isEmpty)
    // vacuum keep=1: old version dirs drain; the live snapshot (now fully
    // self-contained under the new spec) is intact
    val live = state(root)
    Layout.vacuumVersions(spark, root, keep = 1)
    assert(state(root) == live)
    assert(Layout.readCurrent(spark, root).filter($"bucket".isNull).isEmpty)
  }

  test("guards: dir-encoded rename/drop refuse; bad specs refuse") {
    val root = evolved()
    val e1 = intercept[IllegalArgumentException] {
      Layout.renameColumn(spark, root, "region", "geo")
    }
    assert(e1.getMessage.contains("dir-encoded"))
    val e2 = intercept[IllegalArgumentException] {
      Layout.dropColumn(spark, root, "region")
    }
    assert(e2.getMessage.contains("dir-encoded"))
    intercept[IllegalArgumentException] {
      Layout.repartitionTable(spark, root, Seq("bucket")) // unchanged spec
    }
    intercept[IllegalArgumentException] {
      Layout.repartitionTable(spark, root, Seq("nope"))
    }
    // a renamed column cannot enter the spec (dir names carry no mapping)
    Layout.renameColumn(spark, root, "v", "value")
    val e3 = intercept[IllegalArgumentException] {
      Layout.repartitionTable(spark, root, Seq("value"))
    }
    assert(e3.getMessage.contains("renamed"))
  }

  test("multi-level evolution: [region] -> [region, bucket] and back") {
    val root = Files.createTempDirectory("graft_evo2").toString
    Layout.initVersionedManifest(
      rows((1L, "eu", "b1", 10.0), (2L, "us", "b2", 20.0)).coalesce(1),
      root, Seq("region"))
    Layout.repartitionTable(spark, root, Seq("region", "bucket"))
    Layout.upsertVersionedRows(spark, root,
      rows((3L, "eu", "b2", 30.0)), Seq("id"))
    assert(state(root).map(_._1) == Set(1L, 2L, 3L))
    assert(Layout.readCurrent(spark, root).filter($"bucket" === "b2")
      .select($"id").as[Long].collect().toSet == Set(2L, 3L))
    // back to single-level — three specs now coexist
    Layout.repartitionTable(spark, root, Seq("bucket"))
    Layout.upsertVersionedRows(spark, root,
      rows((4L, "ap", "b1", 40.0)), Seq("id"))
    assert(state(root) == Set(
      (1L, "eu", "b1", 10.0), (2L, "us", "b2", 20.0),
      (3L, "eu", "b2", 30.0), (4L, "ap", "b1", 40.0)))
    // compaction converges all three to [bucket]
    Layout.compactVersionedPartitioned(spark, root, targetBytes = 128L << 20)
    val m = ManifestIndex.read(spark, root,
      f"v${Layout.currentVersionNumber(spark, root)}%05d")
    assert(m.entries.forall(_.leaf.startsWith("bucket=")), m.entries.map(_.leaf))
    assert(state(root).map(_._1) == Set(1L, 2L, 3L, 4L))
  }
}
