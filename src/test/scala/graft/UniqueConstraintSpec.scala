package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Layout

/** UNIQUE constraints (S78): declaration validation, the append gates
  * (intra-batch + vs-snapshot, NULL exemption), the per-path
  * allow/refuse matrix (upsert, merge, update, delete), and the
  * rename/drop guards.
  */
class UniqueConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val root = Files.createTempDirectory("graft_uniq").toString + "/t"
    val df = Seq((1L, Option(10L), "x", "a"), (2L, Option(20L), "y", "a"),
        (3L, Option(30L), "z", "b"))
      .toDF("id", "v", "tag", "part")
    Layout.initVersionedManifest(df, root, Seq("part"))
    root
  }

  test("declaration: existing duplicates refused; NULLs exempt; unknown column loud") {
    val root = freshTable()
    intercept[IllegalArgumentException] {
      Layout.addUniqueConstraint(spark, root, "u", Seq("nope")) }
    // two NULL v rows do NOT conflict (SQL UNIQUE semantics) — the
    // declaration scan exempts them
    Layout.appendVersionedRows(spark, root,
      Seq((7L, None: Option[Long], "n1", "a"), (8L, None: Option[Long], "n2", "a"))
        .toDF("id", "v", "tag", "part"))
    Layout.addUniqueConstraint(spark, root, "uv", Seq("v"))
    // a REAL pre-existing duplicate refuses a (re)declaration
    Layout.dropUniqueConstraint(spark, root, "uv")
    Layout.appendVersionedRows(spark, root,
      Seq((9L, Option(10L), "d", "b")).toDF("id", "v", "tag", "part"))
    val e = intercept[IllegalArgumentException] {
      Layout.addUniqueConstraint(spark, root, "uv", Seq("v")) }
    assert(e.getMessage.contains("existing data"))
  }

  test("append gate: intra-batch and vs-snapshot duplicates refuse pre-claim") {
    val root = freshTable()
    Layout.addUniqueConstraint(spark, root, "uid", Seq("id"))
    val before = Layout.currentVersionNumber(spark, root)
    // intra-batch dup
    val e1 = intercept[IllegalArgumentException] {
      Layout.appendVersionedRows(spark, root,
        Seq((9L, Option(90L), "p", "a"), (9L, Option(91L), "q", "b"))
          .toDF("id", "v", "tag", "part")) }
    assert(e1.getMessage.contains("within the batch"))
    // vs existing
    val e2 = intercept[IllegalArgumentException] {
      Layout.appendVersionedRows(spark, root,
        Seq((2L, Option(99L), "p", "b")).toDF("id", "v", "tag", "part")) }
    assert(e2.getMessage.contains("already present"))
    assert(Layout.currentVersionNumber(spark, root) == before)
    // clean batch lands; REPLACE only needs intra-batch uniqueness
    Layout.appendVersionedRows(spark, root,
      Seq((4L, Option(40L), "w", "b")).toDF("id", "v", "tag", "part"))
    Layout.replaceVersionedRows(spark, root,
      Seq((2L, Option(99L), "p", "b")).toDF("id", "v", "tag", "part"))
    assert(Layout.readCurrent(spark, root).count() == 1L)
  }

  test("NULL keys are exempt from the gate") {
    val root = freshTable()
    Layout.addUniqueConstraint(spark, root, "uv", Seq("v"))
    // two more NULL v rows, plus one colliding with nothing
    Layout.appendVersionedRows(spark, root,
      Seq((7L, None: Option[Long], "n1", "a"), (8L, None: Option[Long], "n2", "a"))
        .toDF("id", "v", "tag", "part"))
    assert(Layout.readCurrent(spark, root).filter($"v".isNull).count() == 2L)
  }

  test("upsert: keys must equal the constraint; dup source keys refuse") {
    val root = freshTable()
    Layout.addUniqueConstraint(spark, root, "uid", Seq("id"))
    val e = intercept[IllegalArgumentException] {
      Layout.upsertVersionedRows(spark, root,
        Seq((1L, Option(11L), "x2", "a")).toDF("id", "v", "tag", "part"),
        keys = Seq("id", "part")) }
    assert(e.getMessage.contains("must equal the operation keys"))
    val e2 = intercept[IllegalArgumentException] {
      Layout.upsertVersionedRows(spark, root,
        Seq((1L, Option(11L), "x2", "a"), (1L, Option(12L), "x3", "a"))
          .toDF("id", "v", "tag", "part"), keys = Seq("id")) }
    assert(e2.getMessage.contains("within the batch"))
    // clean keyed upsert passes and stays unique
    Layout.upsertVersionedRows(spark, root,
      Seq((1L, Option(11L), "x2", "a"), (4L, Option(40L), "w", "b"))
        .toDF("id", "v", "tag", "part"), keys = Seq("id"))
    val t = Layout.readCurrent(spark, root)
    assert(t.count() == 4L &&
      t.groupBy("id").count().filter($"count" > 1).isEmpty)
  }

  test("merge: SET on a unique column refused; keyed merge passes") {
    val root = freshTable()
    Layout.addUniqueConstraint(spark, root, "uid", Seq("id"))
    val src = Seq((1L, Option(99L), "u", "a"), (5L, Option(50L), "n", "b"))
      .toDF("id", "v", "tag", "part")
    val e = intercept[IllegalArgumentException] {
      Layout.mergeIntoVersionedRows(spark, root, src, Seq("id"),
        whenMatchedUpdate = Some((lit(true), Map("id" -> (col("id") + 100L))))) }
    assert(e.getMessage.contains("covered by UNIQUE"))
    Layout.mergeIntoVersionedRows(spark, root, src, Seq("id"),
      whenMatchedUpdate = Some((lit(true), Map("v" -> col("src_v")))),
      whenNotMatchedInsert = Some(lit(true)))
    val t = Layout.readCurrent(spark, root)
    assert(t.count() == 4L)
    assert(t.filter($"id" === 1L).select("v").as[Option[Long]].head()
      .contains(99L))
  }

  test("update: assignment to unique column refused, others pass; delete free") {
    val root = freshTable()
    Layout.addUniqueConstraint(spark, root, "uid", Seq("id"))
    val e = intercept[IllegalArgumentException] {
      Layout.updateVersionedRows(spark, root, $"id" === 1L,
        Map("id" -> lit(100L))) }
    assert(e.getMessage.contains("covered by UNIQUE"))
    Layout.updateVersionedRows(spark, root, $"id" === 1L,
      Map("v" -> lit(111L)))
    Layout.deleteVersionedRows(spark, root, $"id" === 2L)
    assert(Layout.readCurrent(spark, root).count() == 2L)
  }

  test("rename/drop guards and constraint lifecycle") {
    val root = freshTable()
    Layout.addUniqueConstraint(spark, root, "uid", Seq("id"))
    intercept[IllegalArgumentException] {
      Layout.addUniqueConstraint(spark, root, "uid", Seq("v")) }
    val e = intercept[IllegalArgumentException] {
      Layout.renameColumn(spark, root, "id", "id2") }
    assert(e.getMessage.contains("UNIQUE"))
    Layout.dropUniqueConstraint(spark, root, "uid")
    intercept[IllegalArgumentException] {
      Layout.dropUniqueConstraint(spark, root, "uid") }
    // gate lifted: duplicates append again
    Layout.appendVersionedRows(spark, root,
      Seq((1L, Option(10L), "dup", "a")).toDF("id", "v", "tag", "part"))
    assert(Layout.readCurrent(spark, root).filter($"id" === 1L).count() == 2L)
  }

  test("SQL face: inline CREATE, ALTER ADD/DROP CONSTRAINT, SHOW CREATE") {
    val root = Files.createTempDirectory("graft_uniq_sql").toString + "/t"
    spark.sql(s"CREATE TABLE graft.`$root` (id BIGINT, v BIGINT, " +
      "pri STRING, CONSTRAINT pk UNIQUE (id)) PARTITIONED BY (pri)")
    spark.sql(s"INSERT INTO graft.`$root` VALUES (1, 10, 'a'), (2, 20, 'b')")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$root` VALUES (1, 99, 'b')") }
    assert(e.getMessage.contains("UNIQUE") ||
      e.getCause != null && e.getCause.getMessage.contains("UNIQUE"))
    val ddl = spark.sql(s"SHOW CREATE TABLE graft.`$root`")
      .head().getString(0)
    assert(ddl.contains("CONSTRAINT pk UNIQUE (id)"))
    // second constraint via ALTER; duplicate v now refuses too
    spark.sql(s"ALTER TABLE graft.`$root` ADD CONSTRAINT uv UNIQUE (v)")
    intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$root` VALUES (3, 10, 'a')") }
    spark.sql(s"ALTER TABLE graft.`$root` DROP CONSTRAINT uv")
    spark.sql(s"INSERT INTO graft.`$root` VALUES (3, 10, 'a')")
    assert(Layout.readCurrent(spark, root).count() == 3L)
    // other constraint families refuse loudly, not cryptically
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$root` ADD CONSTRAINT fk " +
        s"PRIMARY KEY (id)") }
    assert(e2.getMessage.contains("only CHECK and UNIQUE"))
  }

  test("catalog mode: inline UNIQUE at CREATE, ALTER ADD/DROP, gates fire") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    s2.conf.set("spark.graft.warehouse",
      Files.createTempDirectory("graft_uniq_cat_wh").toString)
    s2.sql("CREATE TABLE graft.uq_cat (id BIGINT, v BIGINT, part STRING, " +
      "CONSTRAINT pk UNIQUE (id)) PARTITIONED BY (part)")
    s2.sql("INSERT INTO graft.uq_cat VALUES (1, 10, 'a'), (2, 20, 'b')")
    val e = intercept[Exception] {
      s2.sql("INSERT INTO graft.uq_cat VALUES (1, 99, 'a')") }
    assert(e.getMessage.contains("UNIQUE") ||
      e.getCause != null && e.getCause.getMessage.contains("UNIQUE"))
    s2.sql("ALTER TABLE graft.uq_cat ADD CONSTRAINT uv UNIQUE (v)")
    intercept[Exception] {
      s2.sql("INSERT INTO graft.uq_cat VALUES (3, 10, 'a')") }
    s2.sql("ALTER TABLE graft.uq_cat DROP CONSTRAINT uv")
    s2.sql("INSERT INTO graft.uq_cat VALUES (3, 10, 'a')")
    assert(s2.sql("SELECT count(*) FROM graft.uq_cat").head().getLong(0) == 3L)
    s2.sql("DROP TABLE graft.uq_cat")
  }
}
