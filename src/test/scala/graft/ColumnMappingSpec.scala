package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Layout, ManifestIndex}

/** Column mapping (Delta-shape) on manifest roots: a RENAME changes only
  * the logical name in the manifest schema — the PHYSICAL name (what every
  * parquet footer, stats envelope and bloom uses) is fixed at the column's
  * birth and carried in field metadata. No file rewrite, old versions keep
  * their old names, writers keep emitting physical names, and every
  * skipping/DV/feed path keys on physical identity.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def rows(rs: (Long, String, Double)*) = rs.toDF("id", "part", "v")

  private def init(): String = {
    val root = Files.createTempDirectory("graft_cmap").toString
    Layout.initVersionedManifest(rows(
      (1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0)).coalesce(1),
      root, Seq("part"))
    root
  }

  test("rename is metadata-only: new name, same values, same files; old versions keep old names") {
    val root = init()
    val before = ManifestIndex.read(spark, root, "v00000")
    Layout.renameColumn(spark, root, "v", "price")
    val after = ManifestIndex.read(spark, root, "v00001")
    assert(after.entries.map(e => (e.path, e.size)) ==
      before.entries.map(e => (e.path, e.size)), "rename must not touch files")
    val cur = Layout.readCurrent(spark, root)
    assert(cur.columns.toSeq == Seq("id", "price", "part"))
    assert(cur.select($"id", $"price").as[(Long, Double)].collect().toSet ==
      Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // time travel reads the schema of its day
    assert(Layout.readVersion(spark, root, 0).columns.contains("v"))
  }

  test("writers after a rename emit physical names: old and new files stay mutually readable") {
    val root = init()
    Layout.renameColumn(spark, root, "v", "price")
    Layout.mergeVersionedPartitioned(spark, root,
      Seq((2L, "p1", 99.0), (4L, "p2", 40.0)).toDF("id", "part", "price"),
      Seq("id"), "part")
    assert(Layout.readCurrent(spark, root)
      .select($"id", $"price").as[(Long, Double)].collect().toSet ==
      Set((1L, 10.0), (2L, 99.0), (3L, 30.0), (4L, 40.0)))
    // the new files' FOOTERS spell the physical name, not the logical one
    val m = ManifestIndex.read(spark, root, "v00002")
    val fresh = m.entries.filter(_.path.startsWith("v00002/"))
    assert(fresh.nonEmpty)
    val footer = spark.read.parquet(s"$root/${fresh.head.path}")
    assert(footer.columns.contains("v") && !footer.columns.contains("price"),
      footer.columns.mkString(","))
    // a second rename chains; rename back to the original name also works
    Layout.renameColumn(spark, root, "price", "amount")
    assert(Layout.readCurrent(spark, root).columns.contains("amount"))
    Layout.renameColumn(spark, root, "amount", "v")
    assert(Layout.readCurrent(spark, root)
      .select($"id", $"v").as[(Long, Double)].collect().toSet ==
      Set((1L, 10.0), (2L, 99.0), (3L, 30.0), (4L, 40.0)))
  }

  test("stats skipping and blooms key on physical identity across renames") {
    val root = Files.createTempDirectory("graft_cmap_skip").toString
    val df = spark.range(1000)
      .select($"id", lit("p1").as("part"), ($"id" * 2.0).as("v"))
      .repartitionByRange(4, $"id")
    Layout.initVersionedManifest(df, root, Seq("part"), Seq("id"))
    Layout.renameColumn(spark, root, "id", "key")
    def scanned(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.flatMap(_.selectedPartitions.toPartitionArray.map(_.filePath.toString))
    // range skip through the rename: files are id-range-disjoint
    val q = Layout.readCurrent(spark, root).filter($"key" < 100L)
    assert(scanned(q).size == 1, scanned(q).mkString(","))
    assert(q.count() == 100L)
    // bloom still consulted (declared as 'id' at init — physical identity)
    val eq = Layout.readCurrent(spark, root).filter($"key" === 500L)
    assert(scanned(eq).size == 1)
    assert(eq.count() == 1L)
  }

  test("change feed across a rename is empty; later changes report under the new name") {
    val root = init()
    Layout.renameColumn(spark, root, "v", "price")
    assert(Layout.changeFeed(spark, root, 0, 1, Seq("id")).count() == 0L)
    Layout.updateVersionedRows(spark, root, $"id" === 2L,
      Map("price" -> lit(25.0)))
    val feed = Layout.changeFeed(spark, root, 0, 2, Seq("id"))
    assert(feed.columns.contains("price"))
    assert(feed.select($"id", $"price", $"_change_type")
      .as[(Long, Double, String)].collect().toSet ==
      Set((2L, 20.0, "update_pre"), (2L, 25.0, "update_post")))
  }

  test("deletion vectors address rows through renamed columns") {
    val root = init()
    Layout.renameColumn(spark, root, "v", "price")
    Layout.deleteVersionedRows(spark, root, $"price" === 20.0)
    assert(Layout.readCurrent(spark, root)
      .select($"id").as[Long].collect().toSet == Set(1L, 3L))
    // the data files were not rewritten by the row delete
    val m = ManifestIndex.read(spark, root, "v00002")
    assert(m.entries.forall(_.path.startsWith("v00000/")))
  }

  test("swapped/chained renames: reads and feeds align by physical identity, no collision") {
    val root = Files.createTempDirectory("graft_cmap_swap").toString
    Layout.initVersionedManifest(
      Seq((1L, "p1", 10.0, 100.0), (2L, "p1", 20.0, 200.0))
        .toDF("id", "part", "a", "b").coalesce(1), root, Seq("part"))
    // b -> c, then a -> b: 'b' now means the ORIGINAL a column
    Layout.renameColumn(spark, root, "b", "c")
    Layout.renameColumn(spark, root, "a", "b")
    val cur = Layout.readCurrent(spark, root)
      .select($"id", $"b", $"c").as[(Long, Double, Double)].collect().toSet
    assert(cur == Set((1L, 10.0, 100.0), (2L, 20.0, 200.0)))
    // a feed across BOTH renames (no data change) must be empty — a
    // pairwise rename would collide mid-way and corrupt or throw
    assert(Layout.changeFeed(spark, root, 0, 2, Seq("id")).count() == 0L)
    // and a data change after the swap reports under the final names
    Layout.updateVersionedRows(spark, root, $"id" === 1L, Map("b" -> lit(11.0)))
    val feed = Layout.changeFeed(spark, root, 0, 3, Seq("id"))
      .select($"id", $"b", $"c", $"_change_type")
      .as[(Long, Double, Double, String)].collect().toSet
    assert(feed == Set((1L, 10.0, 100.0, "update_pre"),
      (1L, 11.0, 100.0, "update_post")))
  }

  test("dropColumn is metadata-only: invisible to reads and feeds, bytes never fetched") {
    val root = init()
    val before = ManifestIndex.read(spark, root, "v00000")
    Layout.dropColumn(spark, root, "v")
    val after = ManifestIndex.read(spark, root, "v00001")
    assert(after.entries.map(e => (e.path, e.size)) ==
      before.entries.map(e => (e.path, e.size)), "drop must not touch files")
    val cur = Layout.readCurrent(spark, root)
    assert(cur.columns.toSeq == Seq("id", "part"))
    assert(cur.select($"id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // time travel still shows the column
    assert(Layout.readVersion(spark, root, 0).columns.contains("v"))
    // data-free drop → empty feed; later data changes report without it
    assert(Layout.changeFeed(spark, root, 0, 1, Seq("id")).count() == 0L)
    Layout.deleteVersionedRows(spark, root, $"id" === 2L)
    val feed = Layout.changeFeed(spark, root, 0, 2, Seq("id"))
    assert(!feed.columns.contains("v"))
    assert(feed.select($"id", $"_change_type").as[(Long, String)]
      .collect().toSet == Set((2L, "delete")))
  }

  test("a dropped column's name stays claimed: re-adding it is rejected, not resurrected") {
    val root = init()
    Layout.dropColumn(spark, root, "v")
    // evolution re-adding 'v' would resolve old footers' values — reject
    intercept[IllegalArgumentException] {
      Layout.mergeVersionedPartitioned(spark, root,
        Seq((9L, "p1", 77.0)).toDF("id", "part", "v"), Seq("id"), "part")
    }
    // updates may not assign a dropped column either
    intercept[IllegalArgumentException] {
      Layout.updateVersionedRows(spark, root, $"id" === 1L, Map("v" -> lit(0.0)))
    }
    // dropping a RENAMED column claims its PHYSICAL name: price's physical
    // is 'v2'... (rename v2 would be the birth name) — exercise the chain:
    val root2 = init()
    Layout.renameColumn(spark, root2, "v", "price")
    Layout.dropColumn(spark, root2, "price")
    // re-adding under the PHYSICAL name 'v' is the resurrection vector —
    // rejected at merge
    intercept[IllegalArgumentException] {
      Layout.mergeVersionedPartitioned(spark, root2,
        Seq((9L, "p1", 77.0)).toDF("id", "part", "v"), Seq("id"), "part")
    }
    // while an unrelated fresh name evolves fine
    Layout.mergeVersionedPartitioned(spark, root2,
      Seq((9L, "p1", 77.0)).toDF("id", "part", "w"), Seq("id"), "part")
    assert(Layout.readCurrent(spark, root2).columns.toSeq == Seq("id", "w", "part"))
  }

  test("drop rejections: partition column, unknown, last data column") {
    val root = init()
    intercept[IllegalArgumentException] {
      Layout.dropColumn(spark, root, "part")
    }
    intercept[IllegalArgumentException] {
      Layout.dropColumn(spark, root, "nope")
    }
    Layout.dropColumn(spark, root, "v")
    intercept[IllegalArgumentException] {
      Layout.dropColumn(spark, root, "id") // last active data column
    }
  }

  test("compaction (with z-order on a renamed column) and purge run through the mapping") {
    val root = Files.createTempDirectory("graft_cmap_compact").toString
    val df = spark.range(600)
      .select($"id", lit("p1").as("part"), ($"id" % 37 * 1.0).as("v"))
      .repartition(6) // fragment the leaf
    Layout.initVersionedManifest(df, root, Seq("part"))
    Layout.renameColumn(spark, root, "v", "price")
    Layout.deleteVersionedRows(spark, root, $"price" === 0.0)
    val expect = Layout.readCurrent(spark, root)
      .select($"id", $"price").as[(Long, Double)].collect().toSet
    // compact with z-order named by the NEW logical name — must translate
    val (_, n) = Layout.compactVersionedPartitioned(spark, root,
      targetBytes = 1L << 26, maxFiles = 2, zOrderCols = Seq("price", "id"))
    assert(n == 1)
    val after = Layout.readCurrent(spark, root)
    assert(after.select($"id", $"price").as[(Long, Double)].collect().toSet
      == expect)
    // the rewrite materialized the DV and kept physical footers
    val m = ManifestIndex.read(spark, root,
      f"v${Layout.currentVersionNumber(spark, root)}%05d")
    assert(m.entries.forall(_.dv.isEmpty))
    val footer = spark.read.parquet(s"$root/${m.entries.head.path}")
    assert(footer.columns.contains("v") && !footer.columns.contains("price"))
  }

  test("rejections: partition column, unknown column, collisions (logical and physical)") {
    val root = init()
    intercept[IllegalArgumentException] {
      Layout.renameColumn(spark, root, "part", "region")
    }
    intercept[IllegalArgumentException] {
      Layout.renameColumn(spark, root, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      Layout.renameColumn(spark, root, "v", "id")
    }
    Layout.renameColumn(spark, root, "v", "price")
    // evolution may not add a column spelled like a renamed column's
    // PHYSICAL name — footer resolution would be ambiguous
    intercept[IllegalArgumentException] {
      Layout.mergeVersionedPartitioned(spark, root,
        Seq((9L, "p1", 1.0, "boom")).toDF("id", "part", "price", "v"),
        Seq("id"), "part")
    }
  }

  test("addColumn is metadata-only: old rows read NULL, new writes carry it") {
    val root = init()
    val before = ManifestIndex.read(spark, root, "v00000")
    Layout.addColumn(spark, root, "score",
      org.apache.spark.sql.types.DoubleType)
    val after = ManifestIndex.read(spark, root, "v00001")
    assert(after.entries.map(e => (e.path, e.size)) ==
      before.entries.map(e => (e.path, e.size)), "add must not touch files")
    val cur = Layout.readCurrent(spark, root)
    assert(cur.columns.toSeq == Seq("id", "v", "score", "part"))
    assert(cur.filter($"score".isNotNull).count() == 0)
    // a merge carrying the new column lands values; old rows stay NULL
    Layout.upsertVersionedRows(spark, root,
      Seq((1L, "p1", 10.0, 0.5), (4L, "p2", 40.0, 0.9))
        .toDF("id", "part", "v", "score"), Seq("id"))
    val got = Layout.readCurrent(spark, root)
      .select($"id", $"score").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(0.5), 2L -> None, 3L -> None, 4L -> Some(0.9)))
    // time travel reads the schema of its day
    assert(!Layout.readVersion(spark, root, 0).columns.contains("score"))
  }

  test("addColumn mints a fresh physical name when the logical one was claimed") {
    val root = init()
    // rename v -> price: the ORIGINAL physical name 'v' stays claimed
    Layout.renameColumn(spark, root, "v", "price")
    Layout.addColumn(spark, root, "v", org.apache.spark.sql.types.LongType)
    // re-added 'v' must NOT read the old footers' physical 'v' values
    val cur = Layout.readCurrent(spark, root)
    assert(cur.filter($"v".isNotNull).count() == 0,
      "a reused physical name would resurrect the renamed column's values")
    val man = ManifestIndex.read(spark, root,
      f"v${Layout.currentVersionNumber(spark, root)}%05d")
    val f = man.dataSchema(man.dataSchema.fieldIndex("v"))
    assert(ManifestIndex.physicalName(f) != "v")
    // a dropped column's tombstone keeps its NAME claimed: re-add refuses
    Layout.dropColumn(spark, root, "price")
    val e = intercept[IllegalArgumentException] {
      Layout.addColumn(spark, root, "price",
        org.apache.spark.sql.types.DoubleType)
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("addColumn guards are case-insensitive (Spark resolves that way)") {
    val root = init()
    // committing both 'v' and 'V' would brick every read with
    // AMBIGUOUS_REFERENCE under default case-insensitive resolution
    val e = intercept[IllegalArgumentException] {
      Layout.addColumn(spark, root, "V", org.apache.spark.sql.types.LongType)
    }
    assert(e.getMessage.contains("already exists"))
    // and a fresh physical name never collides case-insensitively either
    Layout.renameColumn(spark, root, "v", "price")
    Layout.addColumn(spark, root, "V", org.apache.spark.sql.types.LongType)
    val man = ManifestIndex.read(spark, root,
      f"v${Layout.currentVersionNumber(spark, root)}%05d")
    val f = man.dataSchema(man.dataSchema.fieldIndex("V"))
    assert(!ManifestIndex.physicalName(f).equalsIgnoreCase("v"))
  }
}
