package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Layout

/** GENERATED ALWAYS AS columns (S77): declaration validation (resolution,
  * determinism, self/generated references, existing-data equality),
  * INSERT fill, writer equality enforcement on EVERY path (append,
  * update), the drop/rename guards, and the SQL face.
  */
class GeneratedColumnSpec extends SparkSpec {
  import spark.implicits._

  // g nullable so the NULL-bearing refusal batches reach the generated
  // probe, not the schema null gate
  private def freshTable(): String = {
    val root = Files.createTempDirectory("graft_gen").toString + "/t"
    val df = Seq((1L, 10L, Option(21L), "a"), (2L, 20L, Option(41L), "b"))
      .toDF("id", "v", "g", "part")
    Layout.initVersionedManifest(df, root, Seq("part"))
    root
  }

  test("declaration validates: resolution, self-ref, determinism, existing data") {
    val root = freshTable()
    // unknown column in the expression → loud at declaration
    intercept[Exception] {
      Layout.setGeneratedColumn(spark, root, "g", "nope + 1") }
    // self-reference refused
    val e1 = intercept[IllegalArgumentException] {
      Layout.setGeneratedColumn(spark, root, "g", "g + 1") }
    assert(e1.getMessage.contains("itself"))
    // non-deterministic refused
    val e2 = intercept[IllegalArgumentException] {
      Layout.setGeneratedColumn(spark, root, "g", "CAST(rand() * 10 AS BIGINT)") }
    assert(e2.getMessage.contains("deterministic"))
    // a scalar subquery resolves and reports deterministic, but would
    // couple generation to ANOTHER table's state — refused at declaration
    spark.range(3).createOrReplaceTempView("gen_other_t")
    val eSub = intercept[IllegalArgumentException] {
      Layout.setGeneratedColumn(spark, root, "g",
        "(SELECT max(id) FROM gen_other_t)") }
    assert(eSub.getMessage.contains("subquery"))
    // existing data must satisfy the invariant: g = 2v+1 holds, g = v does not
    val e3 = intercept[IllegalArgumentException] {
      Layout.setGeneratedColumn(spark, root, "g", "v") }
    assert(e3.getMessage.contains("existing data"))
    Layout.setGeneratedColumn(spark, root, "g", "v * 2 + 1")
    // double-declare refused; references to a generated column refused
    intercept[IllegalArgumentException] {
      Layout.setGeneratedColumn(spark, root, "g", "v * 2 + 1") }
    val e4 = intercept[IllegalArgumentException] {
      Layout.setGeneratedColumn(spark, root, "id", "g + 1") }
    assert(e4.getMessage.contains("generated column"))
  }

  test("insert fill when omitted; equality gate when provided") {
    val root = freshTable()
    Layout.setGeneratedColumn(spark, root, "g", "v * 2 + 1")
    // omitted → filled from v
    val (completed, props) = Layout.completeInsertColumns(spark, root,
      Seq((3L, 30L, "a")).toDF("id", "v", "part"))
    assert(props.isEmpty)
    Layout.appendVersionedRows(spark, root, completed)
    val got = Layout.readCurrent(spark, root).filter($"id" === 3L)
      .select("g").as[Long].head()
    assert(got == 61L)
    // provided-and-correct passes; provided-and-wrong refused pre-claim
    Layout.appendVersionedRows(spark, root,
      Seq((4L, 40L, Option(81L), "b")).toDF("id", "v", "g", "part"))
    val before = Layout.currentVersionNumber(spark, root)
    val e = intercept[IllegalArgumentException] {
      Layout.appendVersionedRows(spark, root,
        Seq((5L, 50L, Option(99L), "b")).toDF("id", "v", "g", "part")) }
    assert(e.getMessage.contains("__generated_g"))
    assert(Layout.currentVersionNumber(spark, root) == before)
    // NULL where the expression is non-null is a violation too (<=>)
    intercept[IllegalArgumentException] {
      Layout.appendVersionedRows(spark, root,
        Seq((6L, 60L, None: Option[Long], "b")).toDF("id", "v", "g", "part")) }
  }

  test("UPDATE must re-derive; dropGeneratedColumn lifts the gate") {
    val root = freshTable()
    Layout.setGeneratedColumn(spark, root, "g", "v * 2 + 1")
    spark.conf.set("spark.graft.warehouse",
      Files.createTempDirectory("graft_gen_wh").toString)
    // an UPDATE that bumps v without re-deriving g breaks the invariant
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$root` SET v = v + 1 WHERE id = 1") }
    assert(e.getMessage.contains("__generated_g"))
    // re-deriving passes (SET sees the OLD row)
    spark.sql(s"UPDATE graft.`$root` SET v = v + 1, g = (v + 1) * 2 + 1 " +
      "WHERE id = 1")
    val got = Layout.readCurrent(spark, root).filter($"id" === 1L)
      .select("v", "g").as[(Long, Long)].head()
    assert(got == ((11L, 23L)))
    // after drop, drift is allowed again
    Layout.dropGeneratedColumn(spark, root, "g")
    spark.sql(s"UPDATE graft.`$root` SET v = v + 1 WHERE id = 1")
    intercept[IllegalArgumentException] {
      Layout.dropGeneratedColumn(spark, root, "g") }
  }

  test("SHOW CREATE re-emits column markers as real DDL") {
    val root = freshTable()
    Layout.setGeneratedColumn(spark, root, "g", "v * 2 + 1")
    Layout.setNotNull(spark, root, "v")
    Layout.setColumnDefault(spark, root, "id", "0")
    spark.conf.set("spark.graft.warehouse",
      Files.createTempDirectory("graft_gen_show_wh").toString)
    val stmt = spark.sql(s"SHOW CREATE TABLE graft.`$root`")
      .head().getString(0)
    assert(stmt.contains("g BIGINT GENERATED ALWAYS AS (v * 2 + 1)"), stmt)
    assert(stmt.contains("v BIGINT NOT NULL"), stmt)
    assert(stmt.contains("id BIGINT DEFAULT 0"), stmt)
  }

  test("rename/drop guards: the generated column and its references") {
    val root = freshTable()
    Layout.setGeneratedColumn(spark, root, "g", "v * 2 + 1")
    val e1 = intercept[IllegalArgumentException] {
      Layout.renameColumn(spark, root, "g", "h") }
    assert(e1.getMessage.contains("GENERATED ALWAYS AS"))
    val e2 = intercept[IllegalArgumentException] {
      Layout.renameColumn(spark, root, "v", "w") }
    assert(e2.getMessage.contains("referenced by generated column"))
    val e3 = intercept[IllegalArgumentException] {
      Layout.dropColumn(spark, root, "v") }
    assert(e3.getMessage.contains("referenced by generated column"))
  }

  test("marker collisions: identity and DEFAULT are mutually exclusive with generation") {
    val root = freshTable()
    Layout.setColumnDefault(spark, root, "g", "7")
    val e = intercept[IllegalArgumentException] {
      Layout.setGeneratedColumn(spark, root, "g", "v * 2 + 1") }
    assert(e.getMessage.contains("DEFAULT"))
    Layout.dropColumnDefault(spark, root, "g")
    Layout.setIdentityColumn(spark, root, "id")
    val e2 = intercept[IllegalArgumentException] {
      Layout.setGeneratedColumn(spark, root, "id", "v") }
    assert(e2.getMessage.contains("identity"))
    // identity + generated coexist on DIFFERENT columns (fill order is
    // defaults → identity → generated)
    Layout.setGeneratedColumn(spark, root, "g", "v * 2 + 1")
    val (completed, props) = Layout.completeInsertColumns(spark, root,
      Seq((70L, "a")).toDF("v", "part"))
    assert(props.nonEmpty) // identity high-water advanced
    Layout.appendVersionedRows(spark, root, completed, extraProps = props)
    val got = Layout.readCurrent(spark, root)
      .filter($"v" === 70L).select("g").as[Long].head()
    assert(got == 141L)
  }
}
