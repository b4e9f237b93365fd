package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** DSv2 GraftCatalog end-to-end: the full SQL lifecycle routed through
  * Spark's OWN grammar + catalog resolution (no parse-time lowering) —
  * CREATE (+ inline CHECK), INSERT (v2 write), SELECT (+ time travel),
  * ALTER column ops, constraint ADD/DROP, MERGE/UPDATE/DELETE (parser-
  * lowered in catalog mode), SHOW TABLES, USE, RENAME TO, TRUNCATE,
  * INSERT OVERWRITE, CTAS, DROP.
  *
  * Runs in a `newSession()` with `spark.sql.catalog.graft` set: catalog
  * registration is sticky on a session's CatalogManager, so isolating it
  * keeps every other suite on the non-catalog path (both paths must stay
  * green — they are the same Layout ops under two resolution fronts).
  */
class GraftCatalogSpec extends SparkSpec {

  private lazy val cat: SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    s.conf.set("spark.graft.warehouse",
      Files.createTempDirectory("graft-cat-wh").toString)
    s
  }

  private def sql(q: String) = cat.sql(q)

  test("catalog lifecycle: create with constraint, insert, read, constraint gate") {
    sql("""CREATE TABLE graft.cat_t (id BIGINT, v INT, part STRING,
           CONSTRAINT v_ok CHECK (v >= 0)) PARTITIONED BY (part)""")
    assert(sql("SHOW TABLES IN graft").collect()
      .exists(_.getString(1) == "cat_t"))

    sql("""INSERT INTO graft.cat_t
           SELECT id, CAST(id % 10 AS INT) AS v,
             CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS part
           FROM range(100)""")
    assert(sql("SELECT count(*) FROM graft.cat_t").head().getLong(0) == 100L)
    assert(sql("SELECT sum(v) FROM graft.cat_t").head().getLong(0) == 450L)

    // writer-enforced CHECK through the DSv2 write path
    val e = intercept[Exception] {
      sql("INSERT INTO graft.cat_t VALUES (999, -1, 'a')")
    }
    assert(e.getMessage.contains("v_ok") || e.getMessage.contains("CHECK"),
      s"expected constraint refusal, got: ${e.getMessage}")
    assert(sql("SELECT count(*) FROM graft.cat_t").head().getLong(0) == 100L)
  }

  test("catalog DML: update / delete / merge lower through the parser") {
    sql("UPDATE graft.cat_t SET v = v + 100 WHERE id % 10 = 0")
    assert(sql("SELECT count(*) FROM graft.cat_t WHERE v >= 100")
      .head().getLong(0) == 10L)

    sql("DELETE FROM graft.cat_t WHERE id >= 90")
    assert(sql("SELECT count(*) FROM graft.cat_t").head().getLong(0) == 90L)

    sql("""MERGE INTO graft.cat_t t
           USING (SELECT id, CAST(777 AS INT) AS v, 'a' AS part
                  FROM range(5)) s
           ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET v = s.v
           WHEN NOT MATCHED THEN INSERT *""")
    assert(sql("SELECT count(*) FROM graft.cat_t WHERE v = 777")
      .head().getLong(0) == 5L)
  }

  test("catalog time travel: VERSION AS OF reads the pinned snapshot") {
    val versions = sql("DESCRIBE HISTORY graft.cat_t").collect()
      .map(_.getInt(0)).sorted
    // v0 create (empty), v1 the inline-CHECK metadata commit, v2 the
    // first insert of 100, then update/delete/merge commits
    assert(sql("SELECT count(*) FROM graft.cat_t VERSION AS OF 0")
      .head().getLong(0) == 0L)
    assert(sql("SELECT count(*) FROM graft.cat_t VERSION AS OF 2")
      .head().getLong(0) == 100L)
    assert(versions.length >= 6)
  }

  test("catalog ALTER: add / rename / widen / drop column, constraints") {
    sql("ALTER TABLE graft.cat_t ADD COLUMN score DOUBLE")
    assert(sql("SELECT * FROM graft.cat_t").columns.contains("score"))
    sql("ALTER TABLE graft.cat_t RENAME COLUMN score TO quality")
    assert(sql("SELECT * FROM graft.cat_t").columns.contains("quality"))
    sql("ALTER TABLE graft.cat_t ALTER COLUMN v TYPE BIGINT")
    assert(sql("SELECT * FROM graft.cat_t").schema("v").dataType ==
      org.apache.spark.sql.types.LongType)
    sql("ALTER TABLE graft.cat_t DROP COLUMN quality")
    assert(!sql("SELECT * FROM graft.cat_t").columns.contains("quality"))

    sql("ALTER TABLE graft.cat_t ADD CONSTRAINT v_cap CHECK (v < 1000)")
    val e = intercept[Exception] {
      sql("INSERT INTO graft.cat_t VALUES (5000, 5000, 'a')")
    }
    assert(e.getMessage.contains("v_cap") || e.getMessage.contains("CHECK"))
    sql("ALTER TABLE graft.cat_t DROP CONSTRAINT v_cap")
    sql("INSERT INTO graft.cat_t VALUES (5000, 5000, 'a')")
    sql("DELETE FROM graft.cat_t WHERE id = 5000")
  }

  test("catalog INSERT OVERWRITE and TRUNCATE") {
    sql("CREATE TABLE graft.cat_o (id BIGINT, part STRING) PARTITIONED BY (part)")
    sql("INSERT INTO graft.cat_o SELECT id, 'x' FROM range(10)")
    sql("INSERT OVERWRITE graft.cat_o SELECT id, 'y' FROM range(3)")
    assert(sql("SELECT count(*) FROM graft.cat_o").head().getLong(0) == 3L)
    assert(sql("SELECT count(*) FROM graft.cat_o WHERE part = 'x'")
      .head().getLong(0) == 0L)
    sql("TRUNCATE TABLE graft.cat_o")
    assert(sql("SELECT count(*) FROM graft.cat_o").head().getLong(0) == 0L)
    // previous versions stay time-travelable
    assert(sql("SELECT count(*) FROM graft.cat_o VERSION AS OF 1")
      .head().getLong(0) == 10L)
    sql("DROP TABLE graft.cat_o")
  }

  test("catalog CTAS routes create + v2 write") {
    sql("""CREATE TABLE graft.cat_ctas PARTITIONED BY (part)
           AS SELECT id, CASE WHEN id % 2 = 0 THEN 'e' ELSE 'o' END AS part
           FROM range(20)""")
    assert(sql("SELECT count(*) FROM graft.cat_ctas").head().getLong(0) == 20L)
    assert(sql("SELECT count(DISTINCT part) FROM graft.cat_ctas")
      .head().getLong(0) == 2L)
    sql("DROP TABLE graft.cat_ctas")
  }

  test("catalog RENAME TO moves the warehouse slot, history intact") {
    sql("CREATE TABLE graft.cat_r1 (id BIGINT, part STRING) PARTITIONED BY (part)")
    sql("INSERT INTO graft.cat_r1 SELECT id, 'p' FROM range(7)")
    sql("ALTER TABLE graft.cat_r1 RENAME TO graft.cat_r2")
    assert(sql("SELECT count(*) FROM graft.cat_r2").head().getLong(0) == 7L)
    assert(!sql("SHOW TABLES IN graft").collect()
      .exists(_.getString(1) == "cat_r1"))
    // history moved with the slot
    assert(sql("SELECT count(*) FROM graft.cat_r2 VERSION AS OF 0")
      .head().getLong(0) == 0L)
    sql("DROP TABLE graft.cat_r2")
  }

  test("RENAME TO an existing table refuses (no silent slot nesting)") {
    sql("CREATE TABLE graft.cat_ra (id BIGINT, part STRING) PARTITIONED BY (part)")
    sql("CREATE TABLE graft.cat_rb (id BIGINT, part STRING) PARTITIONED BY (part)")
    sql("INSERT INTO graft.cat_rb SELECT id, 'p' FROM range(3)")
    val e = intercept[Exception] {
      sql("ALTER TABLE graft.cat_ra RENAME TO graft.cat_rb") }
    assert(e.getMessage.contains("already exists") ||
      e.getMessage.contains("TABLE_OR_VIEW_ALREADY_EXISTS"),
      s"expected already-exists refusal, got: ${e.getMessage}")
    // both tables intact
    assert(sql("SELECT count(*) FROM graft.cat_rb").head().getLong(0) == 3L)
    assert(sql("SELECT count(*) FROM graft.cat_ra").head().getLong(0) == 0L)
    sql("DROP TABLE graft.cat_ra"); sql("DROP TABLE graft.cat_rb")
  }

  test("USE graft: bare-name resolution via the current catalog") {
    sql("USE graft")
    try {
      assert(sql("SELECT count(*) FROM cat_t").head().getLong(0) > 0L)
      assert(sql("SHOW TABLES").collect().exists(_.getString(1) == "cat_t"))
      // bare-name DML under the current catalog qualifies to the graft
      // target before the parse-time lowering
      val before = sql("SELECT count(*) FROM cat_t").head().getLong(0)
      sql("DELETE FROM cat_t WHERE id = 1")
      assert(sql("SELECT count(*) FROM cat_t").head().getLong(0) == before - 1)
      val v2 = sql("SELECT v FROM cat_t WHERE id = 2").head().getLong(0)
      sql("UPDATE cat_t SET v = v + 1 WHERE id = 2")
      assert(sql("SELECT v FROM cat_t WHERE id = 2").head().getLong(0) == v2 + 1)
      // a TEMP VIEW shadows the bare name (1-part resolution order) — the
      // qualification must NOT fire, so the DML fails on the view loudly
      // instead of silently hitting the base table it shadows
      cat.range(1).createOrReplaceTempView("cat_t")
      try {
        val n = sql("SELECT count(*) FROM graft.cat_t").head().getLong(0)
        intercept[Exception] { sql("DELETE FROM cat_t WHERE id = 3") }
        assert(sql("SELECT count(*) FROM graft.cat_t").head().getLong(0) == n,
          "shadowed DML must not touch the base table")
      } finally cat.catalog.dropTempView("cat_t")
    } finally sql("USE spark_catalog.default")
  }

  test("catalog read plan: joins compose, non-graft statements untouched") {
    val joined = sql("""SELECT a.part, count(*) AS n
                        FROM graft.cat_t a JOIN graft.cat_t b ON a.id = b.id
                        GROUP BY a.part""")
    assert(joined.collect().map(_.getLong(1)).sum > 0L)
    // non-graft paths unaffected in catalog mode
    assert(cat.sql("SELECT 1 AS one").head().getInt(0) == 1)
  }

  test("path-addressed identifiers route through the catalog too") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-cat-path").toString + "/t"
    sql(s"CREATE TABLE graft.`$root` (id BIGINT, v BIGINT, part STRING, " +
      "CONSTRAINT v_ok CHECK (v >= 0)) PARTITIONED BY (part)")
    sql(s"INSERT INTO graft.`$root` SELECT id, id * 2, 'p' FROM range(20)")
    assert(sql(s"SELECT count(*) FROM graft.`$root`").head().getLong(0) == 20L)
    sql(s"UPDATE graft.`$root` SET v = v + 1 WHERE id < 5")
    sql(s"DELETE FROM graft.`$root` WHERE id >= 15")
    assert(sql(s"SELECT sum(v) FROM graft.`$root`").head().getLong(0) ==
      (0 until 15).map(i => i * 2L + (if (i < 5) 1L else 0L)).sum)
    // constraint gate holds on the path ident
    val e = intercept[Exception] {
      sql(s"INSERT INTO graft.`$root` VALUES (99, -1, 'p')") }
    assert(e.getMessage.contains("v_ok") || e.getMessage.contains("CHECK"))
    // a path ident never lands in SHOW TABLES (it is not a warehouse name)
    assert(!sql("SHOW TABLES IN graft").collect()
      .exists(_.getString(1).contains("graft-cat-path")))
    sql(s"DESCRIBE HISTORY graft.`$root`") // parser statements compose
    sql(s"DROP TABLE graft.`$root`")
    intercept[Exception] { sql(s"SELECT * FROM graft.`$root`").collect() }
  }

  test("catalog-mode observability: DESCRIBE and SHOW CREATE via v2 metadata") {
    sql("CREATE TABLE graft.cat_obs (id BIGINT, v BIGINT, part STRING, " +
      "CONSTRAINT v_pos CHECK (v >= 0)) PARTITIONED BY (part)")
    try {
      val desc = sql("DESCRIBE TABLE graft.cat_obs").collect()
        .map(r => r.getString(0)).toSeq
      assert(desc.contains("id") && desc.contains("v") && desc.contains("part"))
      val ddl = sql("SHOW CREATE TABLE graft.cat_obs").head().getString(0)
      assert(ddl.contains("cat_obs"))
      // the v2 table exposes the CHECK constraint (Table.constraints())
      assert(ddl.contains("v_pos") || sql("DESCRIBE TABLE EXTENDED graft.cat_obs")
        .collect().exists(_.toString.contains("v_pos")),
        s"constraint missing from observability surface: $ddl")
    } finally sql("DROP TABLE graft.cat_obs")
  }

  test("drop through the catalog clears the listing") {
    sql("DROP TABLE graft.cat_t")
    assert(!sql("SHOW TABLES IN graft").collect()
      .exists(_.getString(1) == "cat_t"))
    val e = intercept[Exception] { sql("SELECT * FROM graft.cat_t").collect() }
    assert(e.getMessage.toLowerCase.contains("table") ||
      e.getMessage.contains("cat_t"))
  }
}
