package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.AnnSweep
import graft.ops.Quantize

/** Dev harness: the recall/cost sweep under SEEDED vs LLOYD-TRAINED
  * codebooks on a given sf dir — the SCALE.md receipt for "re-run the
  * table with trained books and pick the cheapest qualifying rung"
  * (the production loop the sweep + selectRung exist to close). Not
  * part of the driver contract (Probe.scala's class of tool).
  *
  * Usage: SweepProbe [sfDir] [iters]
  */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val seeded = Quantize.seededCodebooks(m = 4, k = 8, subDim = 16,
      seed = 7)
    val trained = Quantize.trainCodebooks(emb, "embedding", seeded, iters)
    println(f"mse seeded=${Quantize.quantizationMse(emb, "embedding",
      seeded)}%.4f trained=${Quantize.quantizationMse(emb, "embedding",
      trained)}%.4f (iters=$iters)")
    val rot = Quantize.seededRotation(64, seed = 11)
    val (mins, maxs) = Quantize.sqTrain(emb, "embedding", 64)
    def run(tag: String, cb: Array[Array[Array[Double]]]): Unit = {
      // ONE sweep per tag — its internal localCheckpoints are reused by
      // both the table print and the selection pass
      val sweep = AnnSweep.recallCostSweep(emb,
        emb.filter(col("vec_id") >= 60 && col("vec_id") <= 64), cb,
        emb.filter(col("vec_id") < 8), nprobe = 3, rot, mins, maxs,
        k = 5, refine = 3)
      sweep.orderBy("rung", "refine").collect()
        .foreach(r => println(s"$tag ${r.getString(0)}/${r.getLong(1)}" +
          s" recall=${r.getAs[Long]("recall_micro")}" +
          s" code_bytes=${r.getAs[Long]("code_bytes")}" +
          s" float_rows=${r.getAs[Long]("float_rows")}"))
      AnnSweep.selectRung(sweep, targetRecallMicro = 150000L,
          floatRowBytes = 512L)
        .orderBy("choice_rank").collect()
        .foreach(r => println(s"$tag CHOICE ${r.getLong(4)}: " +
          s"${r.getString(0)}/${r.getLong(1)} recall=${r.getLong(2)} " +
          s"total_bytes=${r.getLong(3)}"))
    }
    run("seeded ", seeded)
    run("trained", trained)
    spark.stop()
  }
}
