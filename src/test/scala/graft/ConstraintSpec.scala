package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Layout, ManifestIndex}

/** Writer-enforced CHECK constraints on manifest roots (stored in the v2
  * manifest's properties line): merges and row-level updates validate
  * incoming rows BEFORE claiming a version; the table must already satisfy
  * a constraint when it is added; renaming/dropping a referenced column is
  * refused. Readers never pay anything.
  */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  // v is Option-encoded: the CHECK-NULL-passes test below plants a NULL v,
  // and a tuple-primitive column would store nullable=false — the writers'
  // schema-level null gate (the NULL→0 coercion fix) would then correctly
  // refuse the batch before the CHECK semantics ever apply
  private def rows(rs: (Long, String, Double)*) =
    rs.map { case (i, p, v) => (i, p, Option(v)) }.toDF("id", "part", "v")

  private def init(): String = {
    val root = Files.createTempDirectory("graft_cons").toString
    Layout.initVersionedManifest(rows(
      (1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0)).coalesce(1),
      root, Seq("part"))
    root
  }

  test("constraints gate merges and updates; dropping the constraint ungates") {
    val root = init()
    Layout.addCheckConstraint(spark, root, "v_positive", "v > 0")
    // violating merge rejected, loudly, with NO version claimed
    val vBefore = Layout.currentVersionNumber(spark, root)
    intercept[IllegalArgumentException] {
      Layout.mergeVersionedPartitioned(spark, root,
        rows((9L, "p1", -5.0)), Seq("id"), "part")
    }
    assert(Layout.currentVersionNumber(spark, root) == vBefore)
    // and a later writer is not blocked by any orphaned claim
    Layout.mergeVersionedPartitioned(spark, root,
      rows((9L, "p1", 5.0)), Seq("id"), "part")
    assert(Layout.readCurrent(spark, root).count() == 4L)
    // row-level update validates the NEW images
    intercept[IllegalArgumentException] {
      Layout.updateVersionedRows(spark, root, $"id" === 1L,
        Map("v" -> lit(-1.0)))
    }
    Layout.updateVersionedRows(spark, root, $"id" === 1L, Map("v" -> lit(1.0)))
    // NULL passes (SQL CHECK semantics)
    Layout.mergeVersionedPartitioned(spark, root,
      Seq((10L, "p2", Option.empty[Double])).toDF("id", "part", "v"),
      Seq("id"), "part")
    // dropping the constraint ungates
    Layout.dropCheckConstraint(spark, root, "v_positive")
    Layout.mergeVersionedPartitioned(spark, root,
      rows((11L, "p1", -7.0)), Seq("id"), "part")
    assert(Layout.readCurrent(spark, root).filter($"v" < 0).count() == 1L)
  }

  test("adding a constraint the existing data violates is refused") {
    val root = init()
    intercept[IllegalArgumentException] {
      Layout.addCheckConstraint(spark, root, "small", "v < 25")
    }
    // and nothing was committed
    assert(Layout.currentVersionNumber(spark, root) == 0)
    // unknown column in the predicate fails loudly too
    intercept[Exception] {
      Layout.addCheckConstraint(spark, root, "ghost", "no_such_col > 0")
    }
  }

  test("constraints version with the table and survive carry/clone") {
    val root = init()
    Layout.addCheckConstraint(spark, root, "v_positive", "v > 0")
    val m1 = ManifestIndex.read(spark, root, "v00001")
    assert(m1.constraints == Map("v_positive" -> "v > 0"))
    // v0 predates the constraint — time travel shows none
    assert(ManifestIndex.read(spark, root, "v00000").constraints.isEmpty)
    // a data commit carries the properties forward
    Layout.mergeVersionedPartitioned(spark, root,
      rows((4L, "p2", 40.0)), Seq("id"), "part")
    assert(ManifestIndex.read(spark, root, "v00002").constraints.nonEmpty)
    // clones inherit the constraints
    val clone = Files.createTempDirectory("graft_cons_clone").toString
    Layout.cloneVersion(spark, root, 2, clone)
    intercept[IllegalArgumentException] {
      Layout.mergeVersionedPartitioned(spark, clone,
        rows((9L, "p1", -1.0)), Seq("id"), "part")
    }
  }

  test("renaming or dropping a constrained column is refused until the constraint goes") {
    val root = init()
    Layout.addCheckConstraint(spark, root, "v_positive", "v > 0")
    intercept[IllegalArgumentException] {
      Layout.renameColumn(spark, root, "v", "price")
    }
    intercept[IllegalArgumentException] {
      Layout.dropColumn(spark, root, "v")
    }
    Layout.dropCheckConstraint(spark, root, "v_positive")
    Layout.renameColumn(spark, root, "v", "price")
    assert(Layout.readCurrent(spark, root).columns.contains("price"))
    // constraints added AFTER a rename speak the new name and gate writes
    Layout.addCheckConstraint(spark, root, "price_cap", "price < 100")
    intercept[IllegalArgumentException] {
      Layout.mergeVersionedPartitioned(spark, root,
        Seq((9L, "p1", 500.0)).toDF("id", "part", "price"), Seq("id"), "part")
    }
  }

  test("the column-pin guard resolves case-insensitively, like enforcement") {
    val root = init()
    // the predicate spells the column 'V'; resolution is case-insensitive,
    // so renaming 'v' must still be refused or every later writer breaks
    Layout.addCheckConstraint(spark, root, "upper_ref", "V > 0")
    intercept[IllegalArgumentException] {
      Layout.renameColumn(spark, root, "v", "w")
    }
    Layout.dropCheckConstraint(spark, root, "upper_ref")
    Layout.renameColumn(spark, root, "v", "w")
    assert(Layout.readCurrent(spark, root).columns.contains("w"))
  }

  test("v2 properties round-trip: operations stamped per commit, constraints carried") {
    val root = init()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def firstLine(v: String): String = {
      val in = fs.open(ManifestIndex.manifestPath(root, v))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().next()
      finally in.close()
    }
    assert(firstLine("v00000") == ManifestIndex.FormatTagV2)
    assert(ManifestIndex.read(spark, root, "v00000")
      .properties(ManifestIndex.OperationKey) == "CREATE")
    Layout.addCheckConstraint(spark, root, "v_positive", "v > 0")
    val m = ManifestIndex.read(spark, root, "v00001")
    assert(m.constraints == Map("v_positive" -> "v > 0"))
    assert(m.properties(ManifestIndex.OperationKey) == "ADD CONSTRAINT")
    assert(m.entries == ManifestIndex.read(spark, root, "v00000").entries)
    // each version records ITS operation — the DESCRIBE HISTORY surface
    Layout.mergeVersionedPartitioned(spark, root,
      rows((4L, "p2", 40.0)), Seq("id"), "part")
    Layout.deleteVersionedRows(spark, root, $"id" === 4L)
    val hist = Layout.history(spark, root)
      .select($"version", $"operation").as[(Int, String)].collect().toMap
    assert(hist == Map(0 -> "CREATE", 1 -> "ADD CONSTRAINT",
      2 -> "MERGE", 3 -> "DELETE ROWS"), hist.toString)
  }

  test("metadata-only COUNT(*) and column profile from the manifest") {
    val root = init()
    assert(Layout.countRows(spark, root).contains(3L))
    Layout.deleteVersionedRows(spark, root, $"id" === 2L)
    // DV'd rows subtract exactly
    assert(Layout.countRows(spark, root).contains(2L))
    val prof = Layout.columnStats(spark, root)
      .select($"column", $"nulls", $"min", $"max", $"exact")
      .as[(String, Option[Long], Option[String], Option[String], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // envelopes fold across files; outstanding DVs make the profile
    // conservative, not exact
    assert(prof("v")._3.contains("10.0") && prof("v")._4.contains("30.0"))
    assert(prof("v")._2.contains(0L) && !prof("v")._5)
    Layout.purgeDeletedRows(spark, root)
    assert(Layout.countRows(spark, root).contains(2L))
    val prof2 = Layout.columnStats(spark, root)
      .select($"column", $"min", $"max", $"exact")
      .as[(String, Option[String], Option[String], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(prof2("v")._4, "post-purge profile should be exact")
    assert(prof2("v")._2.contains("10.0") && prof2("v")._3.contains("30.0"))
  }
}
