package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Layout

/** COPY INTO (S73): idempotent file ingest — the file-set-identity half
  * of exactly-once ingestion (the txn watermark S48 being the batch-id
  * half). Replay safety, incremental pickup, csv-with-schema, SQL face.
  */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val root = Files.createTempDirectory("graft_copy").toString + "/t"
    Layout.initVersionedManifest(
      Seq.empty[(Long, Long, String)].toDF("id", "v", "part"),
      root, Seq("part"))
    root
  }

  test("copyInto: ingests once, replays no-op, picks up only new files") {
    val root = freshTable()
    val drop = Files.createTempDirectory("graft_dropzone").toString
    spark.range(10).select($"id", ($"id" * 2).as("v"), lit("a").as("part"))
      .coalesce(2).write.mode("append").parquet(drop)
    val (_, n1) = Layout.copyInto(spark, root, drop)
    assert(n1 == 2)
    assert(Layout.readCurrent(spark, root).count() == 10L)
    // replay: same directory again → nothing fresh, no version claimed
    val vBefore = Layout.currentVersionNumber(spark, root)
    val (_, n2) = Layout.copyInto(spark, root, drop)
    assert(n2 == 0)
    assert(Layout.currentVersionNumber(spark, root) == vBefore)
    assert(Layout.readCurrent(spark, root).count() == 10L)
    // a new file lands in the zone → only IT ingests
    spark.range(10, 15).select($"id", ($"id" * 2).as("v"), lit("b").as("part"))
      .coalesce(1).write.mode("append").parquet(drop)
    val (_, n3) = Layout.copyInto(spark, root, drop)
    assert(n3 == 1)
    assert(Layout.readCurrent(spark, root).count() == 15L)
    // rows are exactly the union, no duplicates
    assert(Layout.readCurrent(spark, root).select(countDistinct($"id"))
      .head().getLong(0) == 15L)
  }

  test("copyInto: csv reads with the table schema; bad format refused") {
    val root = freshTable()
    val drop = Files.createTempDirectory("graft_dropcsv").toString
    spark.range(5).select($"id", ($"id" + 100).as("v"), lit("c").as("part"))
      .coalesce(1).write.mode("append").csv(drop)
    val (_, n) = Layout.copyInto(spark, root, drop, format = "csv")
    assert(n == 1)
    assert(Layout.readCurrent(spark, root).agg(sum($"v")).head().getLong(0)
      == (100L to 104L).sum)
    intercept[IllegalArgumentException] {
      Layout.copyInto(spark, root, drop, format = "orc") }
  }

  test("COPY INTO SQL statement, glob sources, and empty-match refusal") {
    val root = freshTable()
    val drop = Files.createTempDirectory("graft_dropsql").toString
    spark.range(7).select($"id", $"id".as("v"), lit("s").as("part"))
      .coalesce(1).write.mode("append").parquet(drop)
    val out = spark.sql(s"COPY INTO graft.`$root` FROM '$drop'").collect()
    assert(out.head.getInt(1) == 1)
    assert(spark.sql(s"COPY INTO graft.`$root` FROM '$drop'")
      .head().getInt(1) == 0)
    // glob form addresses the files directly
    assert(spark.sql(
      s"COPY INTO graft.`$root` FROM '$drop/part-*.parquet' " +
        "FILEFORMAT = PARQUET").head().getInt(1) == 0)
    assert(Layout.readCurrent(spark, root).count() == 7L)
    intercept[Exception] {
      spark.sql(s"COPY INTO graft.`$root` FROM '$drop/nothing-*'").collect() }
    // non-graft COPY-looking text still falls through to Spark's parser
    intercept[Exception] { spark.sql("COPY INTO other.t FROM '/x'") }
  }
}
