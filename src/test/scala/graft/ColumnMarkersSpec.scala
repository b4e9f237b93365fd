package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Layout

/** NOT NULL / DEFAULT / GENERATED-identity column markers (S69–S71):
  * declaration validation, writer enforcement, INSERT fill semantics,
  * the SQL faces in both modes, and the column-op guards.
  */
class ColumnMarkersSpec extends SparkSpec {
  import spark.implicits._

  // v and tag NULLABLE (Option-encoded): a tuple-primitive column would
  // store nullable=false, and the writers' schema-level null gate (the
  // NULL→0 coercion fix) would then refuse the null-bearing batches this
  // suite plants on purpose
  private def freshTable(): String = {
    val root = Files.createTempDirectory("graft_markers").toString + "/t"
    val df = Seq((1L, Option(10L), Option("x"), "a"),
        (2L, Option(20L), Option("y"), "a"),
        (3L, Option(30L), None: Option[String], "b"))
      .toDF("id", "v", "tag", "part")
    Layout.initVersionedManifest(df, root, Seq("part"))
    root
  }

  test("setNotNull: validates existing data, gates writers, drops cleanly") {
    val root = freshTable()
    // tag has a NULL → refuse
    val e = intercept[IllegalArgumentException] {
      Layout.setNotNull(spark, root, "tag") }
    assert(e.getMessage.contains("NULL"))
    // v is clean → declare
    Layout.setNotNull(spark, root, "v")
    // writers now refuse NULL v
    val bad = Seq((9L, null.asInstanceOf[java.lang.Long], "z", "a"))
      .toDF("id", "v", "tag", "part").select($"id", $"v".cast("long").as("v"),
        $"tag", $"part")
    val e2 = intercept[IllegalArgumentException] {
      Layout.appendVersionedRows(spark, root, bad) }
    assert(e2.getMessage.contains("__not_null_v"))
    // clean rows pass; after drop, NULLs pass again
    Layout.dropNotNull(spark, root, "v")
    Layout.appendVersionedRows(spark, root, bad)
    assert(Layout.readCurrent(spark, root).filter($"v".isNull).count() == 1L)
  }

  test("setNotNull: unknown column / double declare refused; rename guarded") {
    val root = freshTable()
    intercept[IllegalArgumentException] { Layout.setNotNull(spark, root, "nope") }
    Layout.setNotNull(spark, root, "v")
    intercept[IllegalArgumentException] { Layout.setNotNull(spark, root, "v") }
    val e = intercept[IllegalArgumentException] {
      Layout.renameColumn(spark, root, "v", "w") }
    assert(e.getMessage.contains("NOT NULL"))
  }

  test("column DEFAULT: fills omitted insert columns; validation is loud") {
    val root = freshTable()
    // defaults must be column-free and castable
    intercept[Exception] { Layout.setColumnDefault(spark, root, "tag", "id + 1") }
    intercept[Exception] { Layout.setColumnDefault(spark, root, "nope", "'u'") }
    Layout.setColumnDefault(spark, root, "tag", "'unk'")
    val (completed, props) = Layout.completeInsertColumns(spark, root,
      Seq((7L, 70L, "a")).toDF("id", "v", "part"))
    assert(props.isEmpty)
    Layout.appendVersionedRows(spark, root, completed)
    assert(Layout.readCurrent(spark, root)
      .filter($"id" === 7L && $"tag" === "unk").count() == 1L)
    // after drop, omitted column fills NULL again
    Layout.dropColumnDefault(spark, root, "tag")
    val (c2, _) = Layout.completeInsertColumns(spark, root,
      Seq((8L, 80L, "a")).toDF("id", "v", "part"))
    Layout.appendVersionedRows(spark, root, c2)
    assert(Layout.readCurrent(spark, root)
      .filter($"id" === 8L && $"tag".isNull).count() == 1L)
  }

  test("identity: generated above high-water, unique, explicit refused") {
    val root = freshTable()
    Layout.setIdentityColumn(spark, root, "id") // seeds high-water = 3
    // direct append WITH the column (and no watermark) refuses
    val e = intercept[IllegalArgumentException] {
      Layout.appendVersionedRows(spark, root,
        Seq((99L, 1L, "z", "a")).toDF("id", "v", "tag", "part")) }
    assert(e.getMessage.contains("GENERATED"))
    // completeInsertColumns with the column present refuses too
    intercept[IllegalArgumentException] {
      Layout.completeInsertColumns(spark, root,
        Seq((99L, 1L, "z", "a")).toDF("id", "v", "tag", "part")) }
    // two generated batches: all ids unique, all above the seed
    for (_ <- 1 to 2) {
      val (c, props) = Layout.completeInsertColumns(spark, root,
        Seq((100L, "n1", "a"), (200L, "n2", "b")).toDF("v", "tag", "part"))
      assert(props.keys.exists(_.startsWith("identity.")))
      Layout.appendVersionedRows(spark, root, c, extraProps = props)
    }
    val ids = Layout.readCurrent(spark, root).select($"id").as[Long].collect()
    assert(ids.length == 7)
    assert(ids.distinct.length == 7, "generated ids must be unique")
    assert(ids.filter(_ > 3L).length == 4, "4 generated ids above seed 3")
    // not-BIGINT / second identity refused
    intercept[IllegalArgumentException] {
      Layout.setIdentityColumn(spark, root, "tag") }
    intercept[IllegalArgumentException] {
      Layout.setIdentityColumn(spark, root, "v") }
  }

  test("SQL faces: SET/DROP NOT NULL and SET/DROP DEFAULT lower (non-catalog)") {
    val root = freshTable()
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN v SET NOT NULL")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$root` " +
        "SELECT 9L, CAST(NULL AS BIGINT), 'z', 'a'") }
    assert(e.getMessage.contains("__not_null_v"))
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN v DROP NOT NULL")
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN tag SET DEFAULT 'dflt'")
    spark.sql(s"INSERT INTO graft.`$root` (id, v, part) SELECT 50L, 5L, 'a'")
    assert(Layout.readCurrent(spark, root)
      .filter($"id" === 50L && $"tag" === "dflt").count() == 1L)
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN tag DROP DEFAULT")
    spark.sql(s"INSERT INTO graft.`$root` (id, v, part) SELECT 51L, 5L, 'a'")
    assert(Layout.readCurrent(spark, root)
      .filter($"id" === 51L && $"tag".isNull).count() == 1L)
  }

  test("schema-level non-nullable column refuses NULLs loudly (no silent zero)") {
    val root = Files.createTempDirectory("graft_markers_nn").toString + "/t"
    // tuple-primitive v → stored schema nullable=false
    val df = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "v", "part")
    Layout.initVersionedManifest(df, root, Seq("part"))
    val bad = Seq((9L, Option.empty[Long], "a")).toDF("id", "v", "part")
    // before the __schema_not_null gate this batch committed and the NULL
    // read back as 0 — silent corruption, not a refusal
    val e = intercept[IllegalArgumentException] {
      Layout.appendVersionedRows(spark, root, bad) }
    assert(e.getMessage.contains("__schema_not_null_v"))
    assert(Layout.readCurrent(spark, root).count() == 2L)
  }

  test("catalog mode: nullability and default ride TableChange") {
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    s.conf.set("spark.graft.warehouse",
      Files.createTempDirectory("graft-markers-wh").toString)
    s.sql("CREATE TABLE graft.mk (id BIGINT, v BIGINT, tag STRING, " +
      "part STRING) PARTITIONED BY (part)")
    s.sql("INSERT INTO graft.mk SELECT id, id * 10, 'x', 'a' FROM range(3)")
    s.sql("ALTER TABLE graft.mk ALTER COLUMN v SET NOT NULL")
    val e = intercept[Exception] {
      s.sql("INSERT INTO graft.mk VALUES (9, NULL, 'z', 'a')") }
    assert(e.getMessage.contains("__not_null_v"))
    s.sql("ALTER TABLE graft.mk ALTER COLUMN v DROP NOT NULL")
    s.sql("INSERT INTO graft.mk VALUES (9, NULL, 'z', 'a')")
    assert(s.sql("SELECT count(*) FROM graft.mk WHERE v IS NULL")
      .head().getLong(0) == 1L)
    // DEFAULT declared through the marker surfaces as v2 column metadata
    // (SUPPORT_COLUMN_DEFAULT_VALUE), so Spark's OWN insert resolution
    // fills the omitted column — the catalog INSERT face of defaults
    s.sql("ALTER TABLE graft.mk ALTER COLUMN tag SET DEFAULT 'dflt'")
    s.sql("INSERT INTO graft.mk (id, v, part) VALUES (77, 7, 'a')")
    assert(s.sql("SELECT tag FROM graft.mk WHERE id = 77")
      .head().getString(0) == "dflt")
    s.sql("DROP TABLE graft.mk")
  }

  test("catalog mode: CREATE with column DEFAULT; identity refused loudly") {
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    s.conf.set("spark.graft.warehouse",
      Files.createTempDirectory("graft-markers-wh2").toString)
    s.sql("CREATE TABLE graft.mkd (id BIGINT, tag STRING DEFAULT 'unk', " +
      "part STRING) PARTITIONED BY (part)")
    s.sql("INSERT INTO graft.mkd (id, part) VALUES (1, 'a')")
    assert(s.sql("SELECT tag FROM graft.mkd WHERE id = 1")
      .head().getString(0) == "unk")
    // identity via the Scala API makes the table catalog-INSERT-refusing
    // (Spark materializes every target column, so generation cannot run)
    val root = graft.plans.GraftPaths.resolve(s, "mkd")
    Layout.setIdentityColumn(s, root, "id")
    val e = intercept[Exception] {
      s.sql("INSERT INTO graft.mkd (tag, part) VALUES ('x', 'a')") }
    assert(e.getMessage.contains("GENERATED identity"))
    s.sql("DROP TABLE graft.mkd")
  }
}
