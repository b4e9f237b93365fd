package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Plain-SQL reads of graft tables (GraftRead): SELECT over graft.`path`
  * and by-name relations, VERSION/TIMESTAMP AS OF time travel, relation
  * composition (joins, CTEs), and the DML-target protection contract.
  */
class SqlReadSpec extends SparkSpec {
  import spark.implicits._

  private def mkRoot(tag: String): String = {
    val root = Files.createTempDirectory(s"graft_read_$tag").toString + "/t"
    val df = spark.range(10)
      .select($"id", ($"id" * 10).cast("long").as("v"),
        concat(lit("p"), ($"id" % 2).cast("string")).as("part"))
    Layout.initVersionedManifest(df, root, Seq("part"))
    root
  }

  test("SELECT over graft.`path` resolves to the live snapshot (DVs apply)") {
    val root = mkRoot("sel")
    spark.sql(s"DELETE FROM graft.`$root` WHERE id >= 8")
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$root`")
      .head().getLong(0) == 8L)
    assert(spark.sql(
      s"SELECT sum(v) AS s FROM graft.`$root` WHERE id < 3").head().getLong(0)
      == 30L)
  }

  test("VERSION AS OF and TIMESTAMP AS OF time-travel in plain SQL") {
    val root = mkRoot("tt")
    Thread.sleep(1100)
    val mark = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    Thread.sleep(1100)
    spark.sql(s"DELETE FROM graft.`$root` WHERE id >= 5")
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$root`")
      .head().getLong(0) == 5L)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft.`$root` VERSION AS OF 0")
      .head().getLong(0) == 10L)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft.`$root` TIMESTAMP AS OF '$mark'")
      .head().getLong(0) == 10L)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$root` VERSION AS OF '1.5'").collect()
    }
    assert(e.getMessage.contains("version number"))
  }

  test("graft relations compose: self-join across versions, CTEs, by name") {
    val wh = Files.createTempDirectory("graft_read_wh").toString
    spark.conf.set(graft.plans.GraftPaths.WarehouseConf, wh)
    try {
      spark.range(6)
        .select($"id", ($"id" * 7).cast("long").as("v"),
          concat(lit("p"), ($"id" % 2).cast("string")).as("part"))
        .createOrReplaceTempView("read_src")
      spark.sql("CREATE TABLE graft.read_t PARTITIONED BY (part) " +
        "AS SELECT * FROM read_src")
      spark.sql("DELETE FROM graft.read_t WHERE id % 3 = 0")
      // live vs v0 in ONE statement, addressed by NAME
      val row = spark.sql(
        """WITH live AS (SELECT count(*) AS n FROM graft.read_t),
          |     v0 AS (SELECT count(*) AS n FROM graft.read_t VERSION AS OF 0)
          |SELECT live.n AS n_live, v0.n AS n_v0 FROM live CROSS JOIN v0
          |""".stripMargin).head()
      assert((row.getLong(0), row.getLong(1)) == ((4L, 6L)))
      // and a join against a non-graft relation
      assert(spark.sql(
        """SELECT count(*) AS n FROM graft.read_t t
          |JOIN read_src s ON t.id = s.id""".stripMargin).head().getLong(0) == 4L)
      spark.sql("DROP TABLE graft.read_t")
    } finally spark.conf.unset(graft.plans.GraftPaths.WarehouseConf)
  }

  test("DML targets are never rewritten into scans; DML sources resolve") {
    val root = mkRoot("prot")
    val src = mkRoot("protsrc")
    // the MERGE target stays a write; its USING side reads ANOTHER graft
    // table through the read rule at command run time
    spark.sql(
      s"""MERGE INTO graft.`$root` t
         |USING (SELECT id, v + 1000 AS v, part FROM graft.`$src`
         |       WHERE id < 2) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    val got = Layout.readCurrent(spark, root)
      .select($"id", $"v").as[(Long, Long)].collect().toMap
    assert(got(0L) == 1000L && got(1L) == 1010L && got(2L) == 20L)
    // subquery conditions reading a graft table resolve too
    spark.sql(s"DELETE FROM graft.`$root` WHERE id IN " +
      s"(SELECT id FROM graft.`$src` WHERE id >= 8)")
    assert(Layout.readCurrent(spark, root).count() == 8L)
  }

  test("non-graft-TARGET DML reads graft sources (only targets are protected)") {
    val src = mkRoot("dmlsrc")
    val out = java.nio.file.Files
      .createTempDirectory("graft_read_plain").toString + "/p"
    spark.sql(s"CREATE TABLE sqlread_plain (id BIGINT) USING parquet " +
      s"LOCATION '$out'")
    try {
      // INSERT with a NON-graft target whose SELECT reads a graft table:
      // the blanket-inertness version of the rule broke exactly this
      spark.sql(s"INSERT INTO sqlread_plain SELECT id FROM graft.`$src` " +
        "WHERE id < 3")
      assert(spark.sql("SELECT count(*) AS n FROM sqlread_plain")
        .head().getLong(0) == 3L)
    } finally spark.sql("DROP TABLE sqlread_plain")
  }

  test("VERSION AS OF beyond Int range refuses with the curated message") {
    val root = mkRoot("bigv")
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$root` VERSION AS OF '99999999999'")
        .collect()
    }
    assert(e.getMessage.contains("version number"), e.getMessage)
  }

  test("non-graft relations are untouched; unknown graft tables fail loudly") {
    spark.range(3).createOrReplaceTempView("plain_read_view")
    assert(spark.sql("SELECT count(*) AS n FROM plain_read_view")
      .head().getLong(0) == 3L)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.`/no/such/root`").collect()
    }
    assert(e.getMessage.nonEmpty)
  }
}
