package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch profiling main — NOT committed
object ProfileTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      graft.util.Caches.releaseAll(); spark.catalog.clearCache()
    }

    // warmup
    SparkEntry.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001").count()
    SparkEntry.queries("q34_minhash_neardup")(spark, "/root/testdata/sf0.001").count()
    SparkEntry.queries("q36_ngram_jaccard")(spark, "/root/testdata/sf0.001").count()
    SparkEntry.queries("q63_text_embed_neardup")(spark, "/root/testdata/sf0.001").count()

    import graft.functions.TextFunctions
    import graft.sources.Tables

    // --- jaccardPairs decomposition ---
    val docs = Tables.documents(spark, dir)
    time("jac.shingle_only") {
      docs.select(col("doc_id"),
        TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))
        .filter(size(col("sh")) > 0).count()
    }
    time("jac.explode") {
      docs.select(col("lang"), col("doc_id"),
        explode(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3)).as("tok"))
        .count()
    }
    time("jac.window_dfcap") {
      val d = docs.select(col("lang"), col("doc_id").as("id"),
        TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      val inv = d.select(col("lang"), col("id"), explode(col("sh")).as("tok"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"), col("tok"))
      inv.withColumn("__df", count(lit(1)).over(w)).filter(col("__df") <= 64).count()
    }
    time("jac.full_q36") { SparkEntry.queries("q36_ngram_jaccard")(spark, dir).count() }
    time("jac.full_q36_again") { SparkEntry.queries("q36_ngram_jaccard")(spark, dir).count() }

    // --- minhash decomposition ---
    time("mh.shingles_cache") {
      val ws = graft.util.Caches.cache(docs
        .select(col("doc_id").as("id"),
          TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))
        .filter(size(col("sh")) > 0)).toDF
      ws.count()
    }
    time("mh.signature") {
      val ws = docs.select(col("doc_id").as("id"),
        TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      ws.select(col("id"), graft.ops.MinHashDedup.signature(col("sh"), 16).as("sig"))
        .select(max(element_at(col("sig"), 1))).count()
    }
    time("mh.full_q34") { SparkEntry.queries("q34_minhash_neardup")(spark, dir).count() }

    // --- text embed decomposition ---
    time("te.embed_only") {
      graft.ops.TextEmbed.hashEmbed(docs, "doc_id", "text", 64).count()
    }
    time("te.full_q63") { SparkEntry.queries("q63_text_embed_neardup")(spark, dir).count() }

    // --- q70 decomposition ---
    time("q70.edges") {
      graft.ops.SetSimJoin.jaccardPairs(docs, "doc_id", "text", 3, 0.1,
        Some("lang"), Some(64L)).count()
    }
    time("q70.full") { SparkEntry.queries("q70_dedup_groups")(spark, dir).count() }
    time("q72.full") { SparkEntry.queries("q72_stream_tumbling")(spark, dir).count() }
    spark.stop()
  }
}
