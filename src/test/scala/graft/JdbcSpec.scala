package graft

import graft.load.JdbcLoad

/** S6/S7 integration: the ONLY reference path round 1 never executed
  * end-to-end. Embedded Derby (shipped with Spark) stands in for PostgreSQL
  * — same Spark JDBC sink code path (dialect DDL, batched inserts, SaveMode
  * semantics), no network.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def opts(table: String) =
    JdbcLoad.options(url, table, "", "",
      driver = "org.apache.derby.jdbc.EmbeddedDriver")
      // Derby embedded needs no credentials; empty ones upset its auth
      .removed("user").removed("password")

  private def readTable(table: String) =
    spark.read.format("jdbc").options(opts(table)).load()

  test("overwrite load creates and replaces the table (loading.py:129-137 path)") {
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
    JdbcLoad.overwrite(df, opts("hist"), connections = 2)
    assert(readTable("hist").count() == 2)
    // overwrite again with different rows — full replace, not append
    val df2 = Seq((3L, "c", 30.0)).toDF("id", "name", "v")
    JdbcLoad.overwrite(df2, opts("hist"), connections = 2)
    assert(readTable("hist").as[(Long, String, Double)].collect().toSet ==
      Set((3L, "c", 30.0)))
  }

  test("appendNew twice ≡ appendNew once (staging + NOT EXISTS, loading.py:141-176)") {
    val target0 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    JdbcLoad.overwrite(target0, opts("inc"), connections = 2)
    val staging = Seq((2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "name")
    JdbcLoad.appendNew(staging, readTable("inc"), Seq("id"), opts("inc"), connections = 2)
    val after1 = readTable("inc").as[(Long, String)].collect().toSet
    assert(after1 == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // rerun with the same staging: the anti-join must append nothing
    JdbcLoad.appendNew(staging, readTable("inc"), Seq("id"), opts("inc"), connections = 2)
    val after2 = readTable("inc").as[(Long, String)].collect().toSet
    assert(after2 == after1, "append must be idempotent under reruns")
    assert(readTable("inc").count() == 4)
  }

  test("streamAppendNew: micro-batches upsert into JDBC idempotently") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_sjdbc").toString
    val ckpt = Files.createTempDirectory("graft_sjdbc_ckpt").toString
    val seed = Seq((1L, "a")).toDF("id", "name")
    JdbcLoad.overwrite(seed, opts("sload"), connections = 2)
    // two OVERLAPPING files land before the first drain — AvailableNow folds
    // them into ONE micro-batch, so key 3 collides within the batch
    Seq((2L, "b"), (3L, "c")).toDF("id", "name")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((3L, "c"), (5L, "e")).toDF("id", "name")
      .coalesce(1).write.mode("append").parquet(dir)
    def drain(): Unit = JdbcLoad.streamAppendNew(
      graft.streaming.StreamingOps.fileStream(spark, dir, seed.schema),
      Seq("id"), opts("sload"), ckpt, connections = 2)
    drain()
    assert(readTable("sload").count() == 4,
      "within-batch duplicate keys must collapse to one insert")
    Seq((3L, "c"), (4L, "d")).toDF("id", "name")
      .coalesce(1).write.mode("append").parquet(dir)
    drain() // second drain: 3L already present → anti-join skips it
    val rows = readTable("sload").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
  }
}
