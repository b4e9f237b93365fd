package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Layout, ManifestIndex}

/** Round-10 type widening (`Layout.widenColumn`): a lossless type change
  * (int → long/double, float → double, decimal precision growth) is ONE
  * manifest commit — no data file rewritten, old narrow footers decoded
  * natively by Spark 4's parquet readers under the wide logical type.
  * Pins: metadata-only (entry identity), mixed narrow/wide file reads,
  * stats-envelope re-encoding (the float → double trap), bloom
  * invalidation, upcast-at-the-door merges, change feeds across the
  * boundary, DV interplay, time travel, and the rejection matrix.
  */
class WideningSpec extends SparkSpec {
  import spark.implicits._

  private def scannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.flatMap(_.selectedPartitions.toPartitionArray.map(_.filePath.toString))

  /** int id + float score + payload, 2 leaves, ids 0..99. */
  private def narrowRoot(bloom: Boolean = false): String = {
    val root = Files.createTempDirectory("graft_widen").toString + "/t"
    val df = spark.range(100)
      .select($"id".cast("int").as("id"),
        (when($"id" === 7L, lit(0.1f)).otherwise(lit(0.05f))).as("score"),
        concat(lit("p"), ($"id" % 2).cast("string")).as("part"))
    Layout.initVersionedManifest(df.repartitionByRange(4, $"id"), root,
      Seq("part"), if (bloom) Seq("id") else Seq.empty)
    root
  }

  test("widenColumn int->long is metadata-only; mixed files read as one table") {
    val root = narrowRoot()
    val before = ManifestIndex.read(spark, root, "v00000")
    Layout.widenColumn(spark, root, "id", LongType)
    val after = ManifestIndex.read(spark, root, "v00001")
    // no data file rewritten: identical (path, size) inventory
    assert(after.entries.map(e => (e.path, e.size)).sorted ==
      before.entries.map(e => (e.path, e.size)).sorted)
    assert(after.dataSchema("id").dataType == LongType)
    val cur = Layout.readCurrent(spark, root)
    assert(cur.schema("id").dataType == LongType)
    assert(cur.agg(sum($"id")).as[Long].head() == 4950L)
    // time travel reads the schema of its day
    assert(Layout.readVersion(spark, root, 0)
      .schema("id").dataType == IntegerType)
    // the commit is in the operation ledger
    assert(Layout.history(spark, root).filter($"operation" === "WIDEN COLUMN")
      .count() == 1L)
    // a wide-keyed merge appends rows no int can hold; one scan serves both
    Layout.mergeVersionedPartitioned(spark, root,
      Seq((5_000_000_000L, 0.5f, "p0")).toDF("id", "score", "part"),
      Seq("id"), "part")
    val all = Layout.readCurrent(spark, root)
    assert(all.count() == 101L)
    assert(all.agg(max($"id")).as[Long].head() == 5_000_000_000L)
  }

  test("stats envelopes are re-encoded, not re-read: the float->double trap") {
    val root = narrowRoot()
    Layout.widenColumn(spark, root, "score", DoubleType)
    // the file holding id=7 has float max 0.1f; naively decoding its "0.1"
    // bound as double would cap the envelope at 0.1d and WRONGLY prune
    // this probe — the widened data value is (double)0.1f = 0.10000000149…
    val probe = Layout.readCurrent(spark, root).filter($"score" > 0.1d)
    assert(probe.count() == 1L, "re-encoded envelope must keep the file")
    assert(probe.select($"id".cast("long")).as[Long].head() == 7L)
    // and the envelope still prunes what it can: nothing sits above 0.2
    val none = Layout.readCurrent(spark, root).filter($"score" > 0.2d)
    assert(scannedFiles(none).isEmpty)
    // int bounds survive the trip too — a range probe keeps skipping
    Layout.widenColumn(spark, root, "id", LongType)
    val low = Layout.readCurrent(spark, root).filter($"id" < 25L)
    assert(scannedFiles(low).size == 2, // one ranged file per leaf
      scannedFiles(low).mkString(","))
    assert(low.count() == 25L)
  }

  test("widening drops the column's blooms (stale narrow-value bits could prune wrongly)") {
    val root = narrowRoot(bloom = true)
    val phys = "id"
    assert(ManifestIndex.read(spark, root, "v00000").entries
      .forall(_.stats.get.cols(phys).bloom.isDefined))
    Layout.widenColumn(spark, root, "id", LongType)
    val m = ManifestIndex.read(spark, root, "v00001")
    assert(m.entries.forall(_.stats.get.cols(phys).bloom.isEmpty))
    // point probes stay CORRECT (envelopes still prune; blooms just gone)
    val hit = Layout.readCurrent(spark, root).filter($"id" === 42L)
    assert(hit.count() == 1L)
    // a later merge rewrite collects fresh blooms under the wide type
    Layout.mergeVersionedPartitioned(spark, root,
      Seq((42L, 9.9f, "p0")).toDF("id", "score", "part"), Seq("id"), "part")
    val m2 = ManifestIndex.read(spark, root, "v00002")
    val fresh = m2.entries.filter(_.path.startsWith("v00002/"))
    assert(fresh.nonEmpty &&
      fresh.forall(_.stats.get.cols(phys).bloom.isDefined))
    assert(Layout.readCurrent(spark, root).filter($"id" === 42L)
      .select($"score").as[Float].head() == 9.9f)
  }

  test("merges may keep sending the narrow type: upcast at the door") {
    val root = narrowRoot()
    Layout.widenColumn(spark, root, "id", LongType)
    // producer still emits int ids — accepted, values land widened
    Layout.mergeVersionedPartitioned(spark, root,
      Seq((7, 1.5f, "p1")).toDF("id", "score", "part")
        .withColumn("id", $"id".cast("int")),
      Seq("id"), "part")
    val cur = Layout.readCurrent(spark, root)
    assert(cur.schema("id").dataType == LongType)
    assert(cur.filter($"id" === 7L).select($"score").as[Float].head() == 1.5f)
    assert(cur.count() == 100L)
  }

  test("rejection matrix: narrowing, non-widening, partition and unknown columns") {
    val root = narrowRoot()
    Layout.widenColumn(spark, root, "id", LongType)
    intercept[IllegalArgumentException](
      Layout.widenColumn(spark, root, "id", IntegerType)) // narrowing
    intercept[IllegalArgumentException](
      Layout.widenColumn(spark, root, "id", DoubleType)) // long->double is lossy
    intercept[IllegalArgumentException](
      Layout.widenColumn(spark, root, "part", StringType)) // partition col
    intercept[IllegalArgumentException](
      Layout.widenColumn(spark, root, "nope", LongType)) // unknown
    intercept[IllegalArgumentException](
      Layout.widenColumn(spark, root, "score", StringType)) // not a widening
    // and the narrow merge path refuses what upcasting can't fix: a LONG
    // column into an INT table is not accepted implicitly
    val root2 = narrowRoot()
    intercept[IllegalArgumentException](
      Layout.mergeVersionedPartitioned(spark, root2,
        Seq((5_000_000_000L, 0.5f, "p0")).toDF("id", "score", "part"),
        Seq("id"), "part"))
  }

  test("deletion vectors and widening compose; metadata count/profile stay exact") {
    val root = narrowRoot()
    Layout.deleteVersionedRows(spark, root, $"id" % 10 === 3)
    Layout.widenColumn(spark, root, "id", LongType)
    val cur = Layout.readCurrent(spark, root)
    assert(cur.count() == 90L)
    assert(cur.filter($"id" % 10 === 3).count() == 0L)
    assert(Layout.countRows(spark, root).contains(90L))
    val prof = Layout.columnStats(spark, root)
      .filter($"column" === "id").head()
    assert(prof.getAs[String]("data_type") == "bigint")
    assert(prof.getAs[String]("min") == "0" && prof.getAs[String]("max") == "99")
  }

  test("change feed: empty across a pure widen; typed wide afterwards") {
    val root = narrowRoot()
    Layout.widenColumn(spark, root, "id", LongType) // v1
    assert(Layout.changeFeed(spark, root, 0, 1, Seq("id")).count() == 0L)
    Layout.mergeVersionedPartitioned(spark, root,
      Seq((5_000_000_000L, 0.5f, "p0")).toDF("id", "score", "part"),
      Seq("id"), "part") // v2
    // the feed spans the widen boundary: from-side (narrow files) aligns
    // by upcast, so the only rows are the genuine inserts
    val feed = Layout.changeFeed(spark, root, 0, 2, Seq("id"))
    assert(feed.schema("id").dataType == LongType)
    val rows = feed.select($"_change_type", $"id").collect()
    assert(rows.length == 1 && rows.head.getString(0) == "insert" &&
      rows.head.getLong(1) == 5_000_000_000L)
  }

  test("widening composes with column mapping: rename then widen keeps old footers readable") {
    val root = narrowRoot()
    Layout.renameColumn(spark, root, "id", "doc_id")
    Layout.widenColumn(spark, root, "doc_id", LongType)
    val cur = Layout.readCurrent(spark, root)
    assert(cur.schema("doc_id").dataType == LongType)
    assert(cur.agg(sum($"doc_id")).as[Long].head() == 4950L)
    // physical name still resolves the narrow footers after both changes
    Layout.mergeVersionedPartitioned(spark, root,
      Seq((7_000_000_000L, 0.2f, "p1")).toDF("doc_id", "score", "part"),
      Seq("doc_id"), "part")
    assert(Layout.readCurrent(spark, root).count() == 101L)
  }

  test("decimal precision growth widens without rewrite") {
    val root = Files.createTempDirectory("graft_widen_dec").toString + "/t"
    val df = spark.range(10)
      .select($"id",
        ($"id" * 111).cast(DecimalType(10, 2)).as("amt"),
        lit("p").as("part"))
    Layout.initVersionedManifest(df.repartition(2), root, Seq("part"))
    Layout.widenColumn(spark, root, "amt", DecimalType(20, 2))
    val cur = Layout.readCurrent(spark, root)
    assert(cur.schema("amt").dataType == DecimalType(20, 2))
    assert(cur.agg(sum($"amt")).head().getDecimal(0)
      .compareTo(new java.math.BigDecimal("4995.00")) == 0)
    intercept[IllegalArgumentException]( // scale change is NOT a widening
      Layout.widenColumn(spark, root, "amt", DecimalType(22, 4)))
  }
}
