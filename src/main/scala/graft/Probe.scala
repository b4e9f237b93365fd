package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time individual registered queries.
  *
  * Usage: Probe <sfDir> <query>[ <query>...]  — prints per-query seconds for
  * two timed runs (cold, then repeat after cache release), plus the formatted
  * plan when PROBE_EXPLAIN=1. Not part of the driver contract; exists so perf
  * work doesn't require a full Bench sweep.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // PROBE_WARM_DIR: run each query there once, untimed, first (mimics
    // Bench's warmup so cold-JIT cost is excluded from the timed runs).
    sys.env.get("PROBE_WARM_DIR").foreach { wd =>
      names.foreach { q =>
        try SparkEntry.queries(q)(spark, wd).count()
        catch { case _: Throwable => () }
      }
      graft.util.Caches.releaseAll()
      spark.catalog.clearCache()
    }
    names.foreach { q =>
      val fn = SparkEntry.queries(q)
      if (sys.env.get("PROBE_EXPLAIN").contains("1"))
        fn(spark, sfDir).explain("formatted")
      def once(): Double = {
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        graft.util.Caches.releaseAll()
        spark.catalog.clearCache()
        println(f"  $q%-28s $t%7.2f s  ($n rows)")
        t
      }
      once(); once()
    }
    spark.stop()
  }
}
