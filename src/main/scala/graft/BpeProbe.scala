package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: measure BPE training throughput (merges/sec) of the
  * driver-side trainer vs the distributed per-round job loop on a given
  * sf dir — the SCALE.md receipt for the production-merge-count path.
  * Not part of the driver contract (Probe.scala's class of tool).
  *
  * Usage: BpeProbe [sfDir] [localRounds] [distRounds]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val localRounds = args.lift(1).map(_.toInt).getOrElse(4000)
    val distRounds = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    println(s"vocab=${graft.ops.Bpe.wordCounts(docs, "text").count()}")
    // warm both paths (JIT/codegen) so the timed runs measure the
    // algorithm, not first-use compilation
    graft.ops.Bpe.trainMergesLocal(docs, "text", rounds = 5).count()
    graft.ops.Bpe.trainMerges(docs, "text", rounds = 2).count()
    var t0 = System.nanoTime()
    val nLocal = graft.ops.Bpe.trainMergesLocal(docs, "text",
      rounds = localRounds).count()
    val tLocal = (System.nanoTime() - t0) / 1e9
    println(f"local: $nLocal merges in $tLocal%.2f s = " +
      f"${nLocal / tLocal}%.0f merges/sec")
    t0 = System.nanoTime()
    val nDist = graft.ops.Bpe.trainMerges(docs, "text",
      rounds = distRounds).count()
    val tDist = (System.nanoTime() - t0) / 1e9
    println(f"dist:  $nDist merges in $tDist%.2f s = " +
      f"${nDist / tDist}%.2f merges/sec")

    // PRODUCTION-SHAPE run: the testdata corpus has a ~31-word synthetic
    // vocabulary (drains in <100 merges), so the 32k-merge claim is
    // measured on a seeded wide vocabulary — random 3–12 char words,
    // zipf-ish frequencies; content is irrelevant to throughput, shape
    // (vocab size × word length) is everything
    val rnd = new scala.util.Random(42)
    val wide = Array.tabulate(200000) { i =>
      val len = 3 + rnd.nextInt(10)
      val w = Array.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
      (w + "_" + i, 1000000L / (i + 1) + 1L)
    }
    t0 = System.nanoTime()
    val nWide = graft.ops.Bpe.trainLocal(wide, rounds = 32000,
      eow = true).length
    val tWide = (System.nanoTime() - t0) / 1e9
    println(f"wide:  $nWide merges over ${wide.length} words in " +
      f"$tWide%.2f s = ${nWide / tWide}%.0f merges/sec")
    spark.stop()
  }
}
