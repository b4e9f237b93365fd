package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets = Multimodal.fromDocuments(
    spark.read.parquet(s"${sf()}/documents.parquet"))

  test("asset shape: payload binary + typed metadata") {
    val schema = assets.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(assets.count() > 0)
  }

  test("metadata-only projection prunes the payload column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_assets").toString
    assets.write.mode("overwrite").parquet(dir)
    val plan = Multimodal.metadataOnly(spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("payload"), "payload must be pruned from ReadSchema")
  }

  test("stub decode yields deterministic fixed-dim unit features") {
    val f = assets.limit(5).select($"asset_id",
      Multimodal.stubDecodeFeatures(8, $"payload").as("feat"))
    val rows = f.collect()
    assert(rows.forall(_.getSeq[Double](1).length == 8))
    assert(rows.forall(_.getSeq[Double](1).forall(v => v >= 0.0 && v < 1.0)))
    val again = f.collect()
    assert(rows.map(_.getSeq[Double](1)).toSeq == again.map(_.getSeq[Double](1)).toSeq)
  }

  test("stub resize clamps dims into the box, preserves aspect ratio") {
    val out = Multimodal.stubResize(assets, 100, 100)
    val dims = out.select($"meta.width", $"meta.height").collect()
    assert(dims.forall(r => r.getInt(0) <= 100 && r.getInt(1) <= 100))
    assert(out.head().getAs[org.apache.spark.sql.Row]("meta")
      .getAs[String]("codec").endsWith("+resized"))
  }

  test("frame sampling explodes bounded per-asset rows") {
    val frames = Multimodal.sampleFrames(assets.limit(3), everyNth = 50, maxFrames = 4, dim = 4)
    val counts = frames.groupBy("asset_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(n => n >= 1 && n <= 4))
  }
}
