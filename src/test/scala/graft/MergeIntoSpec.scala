package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{Layout, ManifestIndex}

/** Conditional MERGE INTO (`Layout.mergeIntoVersionedRows`): three-clause
  * merge-on-read semantics — delete-first clause order, per-clause
  * conditions over (target, src_) pairs, untouched non-matching rows, the
  * multi-match cardinality error, no-op behavior, and no-rewrite entry
  * identity.
  */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def mkRoot(tag: String): (String, DataFrame) = {
    val root = Files.createTempDirectory(s"graft_mi_$tag").toString + "/t"
    val df = spark.range(20)
      .select($"id", ($"id" * 10).cast("long").as("v"),
        concat(lit("p"), ($"id" % 2).cast("string")).as("part"))
    Layout.initVersionedManifest(df.repartitionByRange(3, $"id"), root, Seq("part"))
    (root, df)
  }

  private def state(root: String): Map[Long, (Long, String)] =
    Layout.readCurrent(spark, root).select($"id", $"v", $"part")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("three clauses fire delete-first; unmatched target rows untouched") {
    val (root, _) = mkRoot("full")
    // source: ids 3 (delete), 5 (update: incoming newer), 6 (matched but no
    // clause fires: incoming older), 100 (insert), 200 (insert blocked)
    val src = Seq(
      (3L, -1L, "p1"), (5L, 999L, "p1"), (6L, 1L, "p0"),
      (100L, 7L, "p0"), (200L, -5L, "p0")).toDF("id", "v", "part")
    Layout.mergeIntoVersionedRows(spark, root, src, Seq("id"),
      whenMatchedDelete = Some(col("src_v") < 0L),
      whenMatchedUpdate = Some((col("src_v") > col("v"),
        Map("v" -> col("src_v")))),
      whenNotMatchedInsert = Some(col("v") >= 0L))
    val s = state(root)
    assert(!s.contains(3L))                      // deleted
    assert(s(5L) == (999L, "p1"))                // updated
    assert(s(6L) == (60L, "p0"))                 // matched, no clause → kept
    assert(s(100L) == (7L, "p0"))                // inserted
    assert(!s.contains(200L))                    // insert cond false
    assert(s(7L) == (70L, "p1"))                 // unmatched target untouched
    assert(s.size == 20 - 1 + 1)
  }

  test("delete clause wins over update on the same row") {
    val (root, _) = mkRoot("order")
    val src = Seq((4L, 999L, "p0")).toDF("id", "v", "part")
    Layout.mergeIntoVersionedRows(spark, root, src, Seq("id"),
      whenMatchedDelete = Some(lit(true)),
      whenMatchedUpdate = Some((lit(true), Map("v" -> col("src_v")))))
    assert(!state(root).contains(4L))
  }

  test("matched ≡ merge-on-read upsert when clauses are unconditional") {
    val (miRoot, _) = mkRoot("mi")
    val (upRoot, _) = mkRoot("up")
    val src = Seq((2L, 21L, "p0"), (9L, 91L, "p1"), (50L, 1L, "p0"))
      .toDF("id", "v", "part")
    Layout.mergeIntoVersionedRows(spark, miRoot, src, Seq("id"),
      whenMatchedUpdate = Some((lit(true),
        Map("v" -> col("src_v")))),
      whenNotMatchedInsert = Some(lit(true)))
    Layout.upsertVersionedRows(spark, upRoot, src, Seq("id"))
    assert(state(miRoot) == state(upRoot))
  }

  test("no data file rewritten; no-op claims no version") {
    val (root, _) = mkRoot("files")
    val before = ManifestIndex.read(spark, root, "v00000")
    Layout.mergeIntoVersionedRows(spark, root,
      Seq((8L, 0L, "p0")).toDF("id", "v", "part"), Seq("id"),
      whenMatchedUpdate = Some((lit(true), Map("v" -> lit(0L)))))
    val after = ManifestIndex.read(spark, root, "v00001")
    val beforeFiles = before.entries.map(e => (e.path, e.size)).toSet
    val carried = after.entries.filter(e => e.path.startsWith("v00000/"))
    assert(carried.map(e => (e.path, e.size)).toSet == beforeFiles)
    assert(carried.exists(_.dv.isDefined))
    // a merge where no clause fires commits nothing
    val cur = Layout.currentVersionNumber(spark, root)
    val p = Layout.mergeIntoVersionedRows(spark, root,
      Seq((8L, -1L, "p0")).toDF("id", "v", "part"), Seq("id"),
      whenMatchedUpdate = Some((col("src_v") > col("v"), Map("v" -> col("src_v")))),
      whenNotMatchedInsert = Some(lit(false)))
    assert(Layout.currentVersionNumber(spark, root) == cur)
    assert(p == Layout.resolveCurrent(spark, root))
  }

  test("delete-only and insert-only merges work without images/DVs") {
    val (root, _) = mkRoot("sparse")
    Layout.mergeIntoVersionedRows(spark, root,
      Seq((1L, 0L, "p1"), (300L, 3L, "p0")).toDF("id", "v", "part"), Seq("id"),
      whenMatchedDelete = Some(lit(true)))
    assert(!state(root).contains(1L) && !state(root).contains(300L))
    Layout.mergeIntoVersionedRows(spark, root,
      Seq((301L, 3L, "p1")).toDF("id", "v", "part"), Seq("id"),
      whenNotMatchedInsert = Some(lit(true)))
    assert(state(root)(301L) == (3L, "p1"))
  }

  test("extra source columns serve clauses but never land in the table") {
    val (root, _) = mkRoot("extra")
    val src = Seq((3L, 0L, "p1", "D"), (5L, 999L, "p1", "U"),
      (100L, 7L, "p0", "U"), (101L, 8L, "p0", "D"))
      .toDF("id", "v", "part", "op")
    Layout.mergeIntoVersionedRows(spark, root, src, Seq("id"),
      whenMatchedDelete = Some(col("src_op") === "D"),
      whenMatchedUpdate = Some((col("src_op") =!= "D", Map("v" -> col("src_v")))),
      whenNotMatchedInsert = Some(col("op") =!= "D"))
    val s = state(root)
    assert(!s.contains(3L) && s(5L) == (999L, "p1") && s(100L) == (7L, "p0"))
    assert(!s.contains(101L)) // unmatched delete op no-ops
    assert(!Layout.readCurrent(spark, root).columns.contains("op"))
  }

  test("txn watermark makes replayed merges no-op without reading the source") {
    val (root, _) = mkRoot("txn")
    Layout.mergeIntoVersionedRows(spark, root,
      Seq((5L, 999L, "p1")).toDF("id", "v", "part"), Seq("id"),
      whenMatchedUpdate = Some((lit(true), Map("v" -> col("src_v")))),
      txn = Some(("app", 1L)))
    val ver = Layout.currentVersionNumber(spark, root)
    // replaying batch 1 (even with different content) must not commit
    Layout.mergeIntoVersionedRows(spark, root,
      Seq((6L, 1L, "p0")).toDF("id", "v", "part"), Seq("id"),
      whenMatchedUpdate = Some((lit(true), Map("v" -> col("src_v")))),
      txn = Some(("app", 1L)))
    assert(Layout.currentVersionNumber(spark, root) == ver)
    val s = state(root)
    assert(s(5L) == (999L, "p1") && s(6L) == (60L, "p0"))
  }

  test("partition values needing URL encoding (space) take DVs and stats") {
    // regression: _metadata.file_path is URL-encoded (`p=NOT%20SPECIFIED`)
    // while manifest entry paths are literal — the row-level writers
    // silently missed every row under such leaves (found via q159 on
    // orders' `4-NOT SPECIFIED` priority), and attachStats silently
    // skipped them (metadata COUNT degraded to None)
    val root = Files.createTempDirectory("graft_mi_enc").toString + "/t"
    val df = Seq((1L, 10L, "NOT SPECIFIED"), (2L, 20L, "NOT SPECIFIED"),
      (3L, 30L, "P X"), (4L, 40L, "ok")).toDF("id", "v", "part")
    Layout.initVersionedManifest(df, root, Seq("part"))
    assert(Layout.countRows(spark, root).contains(4L)) // stats attached
    Layout.mergeIntoVersionedRows(spark, root,
      Seq((1L, 0L, "NOT SPECIFIED"), (3L, 99L, "P X")).toDF("id", "v", "part"),
      Seq("id"),
      whenMatchedDelete = Some(col("src_v") === 0L),
      whenMatchedUpdate = Some((lit(true), Map("v" -> col("src_v")))))
    assert(state(root) == Map(2L -> (20L, "NOT SPECIFIED"),
      3L -> (99L, "P X"), 4L -> (40L, "ok")))
  }

  test("a target row matching two source rows throws the cardinality error") {
    val (root, _) = mkRoot("multi")
    val src = Seq((5L, 1L, "p1"), (5L, 2L, "p1")).toDF("id", "v", "part")
    val e = intercept[IllegalArgumentException] {
      Layout.mergeIntoVersionedRows(spark, root, src, Seq("id"),
        whenMatchedUpdate = Some((lit(true), Map("v" -> col("src_v")))))
    }
    assert(e.getMessage.contains("more than one source row"))
  }

  test("duplicate UNMATCHED source keys feeding the insert clause throw") {
    val (root, _) = mkRoot("dupins")
    // both rows miss the target, pass the insert clause, and share a key:
    // appending both would break the unique-key-per-snapshot invariant
    // that changeFeed/upsertVersionedRows rely on (ADVICE r10) — the
    // matched-side cardinality check cannot see them
    val src = Seq((100L, 1L, "p0"), (100L, 2L, "p0")).toDF("id", "v", "part")
    val e = intercept[IllegalArgumentException] {
      Layout.mergeIntoVersionedRows(spark, root, src, Seq("id"),
        whenNotMatchedInsert = Some(lit(true)))
    }
    assert(e.getMessage.contains("duplicate"))
    // no version claimed, table untouched
    assert(state(root).size == 20)
    // duplicates where only ONE row passes the insert condition are legal
    val src2 = Seq((100L, 1L, "p0"), (100L, -2L, "p0")).toDF("id", "v", "part")
    Layout.mergeIntoVersionedRows(spark, root, src2, Seq("id"),
      whenNotMatchedInsert = Some(col("v") >= 0L))
    assert(state(root)(100L) == (1L, "p0"))
  }

  test("partition-column assignment MOVES the row; unknown columns reject") {
    val (root, _) = mkRoot("guard")
    // id=5 lives in p1 (5 % 2 = 1); assigning part moves it: old image
    // DV'd in p1, new image appended under p0 — exactly one row survives
    Layout.mergeIntoVersionedRows(spark, root,
      Seq((5L, 1L, "p1")).toDF("id", "v", "part"), Seq("id"),
      whenMatchedUpdate = Some((lit(true),
        Map("part" -> lit("p0"), "v" -> col("src_v")))))
    assert(state(root)(5L) == (1L, "p0"))
    assert(Layout.readCurrent(spark, root).filter($"id" === 5L).count() == 1L)
    intercept[IllegalArgumentException] {
      Layout.mergeIntoVersionedRows(spark, root,
        Seq((5L, 1L, "p0")).toDF("id", "v", "part"), Seq("id"),
        whenMatchedUpdate = Some((lit(true), Map("nope" -> lit(1L)))))
    }
  }

  test("update-set expressions cast to the target column type") {
    val (root, _) = mkRoot("settype")
    // an INT literal into the BIGINT column must commit as BIGINT (not
    // brick the next read with an INT32 footer under a LONG schema)
    Layout.mergeIntoVersionedRows(spark, root,
      Seq((5L, 0L, "p1")).toDF("id", "v", "part"), Seq("id"),
      whenMatchedUpdate = Some((lit(true), Map("v" -> lit(7)))))
    assert(state(root)(5L) == (7L, "p1"))
  }

  test("CHECK constraints validate updated and inserted images") {
    val (root, _) = mkRoot("check")
    Layout.addCheckConstraint(spark, root, "v_nonneg", "v >= 0")
    val e = intercept[IllegalArgumentException] {
      Layout.mergeIntoVersionedRows(spark, root,
        Seq((5L, 77L, "p1")).toDF("id", "v", "part"), Seq("id"),
        whenMatchedUpdate = Some((lit(true), Map("v" -> lit(-1L)))))
    }
    assert(e.getMessage.contains("v_nonneg"))
    // the failed merge must not have committed anything
    assert(state(root)(5L) == (50L, "p1"))
  }

  test("NOT MATCHED BY SOURCE: full-sync delete + flag, delete-first order") {
    val (root, _) = mkRoot("bysrc")
    // source holds ids 0..9 only; target rows 10..19 are "by source".
    // delete the odd ones among them, flag the rest with v + 1
    val src = (0L until 10L).map(i => (i, i * 10 + 1, s"p${i % 2}"))
      .toDF("id", "v", "part")
    Layout.mergeIntoVersionedRows(spark, root, src, Seq("id"),
      whenMatchedUpdate = Some((lit(true), Map("v" -> col("src_v")))),
      whenNotMatchedBySourceDelete = Some(col("id") % 2 === 1),
      whenNotMatchedBySourceUpdate = Some((lit(true),
        Map("v" -> (col("v") + 1L)))))
    val s = state(root)
    (0L until 10L).foreach(i => assert(s(i)._1 == i * 10 + 1)) // matched upd
    (10L until 20L).foreach { i =>
      if (i % 2 == 1) assert(!s.contains(i), s"id $i deleted by source")
      else assert(s(i)._1 == i * 10 + 1, s"id $i flagged")
    }
    assert(s.size == 15)
  }

  test("NOT MATCHED BY SOURCE against an EMPTY source applies to every row") {
    val (root, _) = mkRoot("bsempty")
    val src = Seq.empty[(Long, Long, String)].toDF("id", "v", "part")
    Layout.mergeIntoVersionedRows(spark, root, src, Seq("id"),
      whenNotMatchedBySourceDelete = Some(col("v") >= 100L))
    // full sync to empty upstream: rows v >= 100 dropped, rest kept
    assert(state(root).keySet == (0L until 10L).toSet)
    // and without by-source clauses an empty source stays a NO-OP
    val before = Layout.currentVersionNumber(spark, root)
    Layout.mergeIntoVersionedRows(spark, root, src, Seq("id"),
      whenMatchedDelete = Some(lit(true)))
    assert(Layout.currentVersionNumber(spark, root) == before)
  }

  test("by-source update images move partitions and honor CHECK constraints") {
    val (root, _) = mkRoot("bsmove")
    Layout.addCheckConstraint(spark, root, "v_cap", "v <= 1000")
    val src = Seq((0L, 0L, "p0")).toDF("id", "v", "part")
    // partition reassignment through the by-source update: rows absent
    // from the source move to partition 'px'
    Layout.mergeIntoVersionedRows(spark, root, src, Seq("id"),
      whenNotMatchedBySourceUpdate = Some((col("id") >= 18L,
        Map("part" -> lit("px")))))
    val s = state(root)
    assert(s(18L) == (180L, "px") && s(19L) == (190L, "px"))
    assert(s(17L) == (170L, "p1"))
    // a violating by-source assignment rejects before any version claims
    val before = Layout.currentVersionNumber(spark, root)
    val e = intercept[IllegalArgumentException] {
      Layout.mergeIntoVersionedRows(spark, root, src, Seq("id"),
        whenNotMatchedBySourceUpdate = Some((lit(true),
          Map("v" -> lit(5000L)))))
    }
    assert(e.getMessage.contains("v_cap"))
    assert(Layout.currentVersionNumber(spark, root) == before)
  }
}
