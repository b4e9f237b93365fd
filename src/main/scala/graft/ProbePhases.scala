package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: split a registered query's wall time into plan (analyze +
  * optimize + physical planning) and execute phases. Not driver contract.
  */
object ProbePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val q = args(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // forces analysis/optimization/planning
      val t2 = System.nanoTime()
      val n = df.count()
      val t3 = System.nanoTime()
      if (i == 1 && sys.env.get("PROBE_EXPLAIN").contains("1"))
        println(df.queryExecution.executedPlan.toString)
      graft.util.Caches.releaseAll()
      spark.catalog.clearCache()
      println(f"run$i: build=${(t1 - t0) / 1e9}%6.2f plan=${(t2 - t1) / 1e9}%6.2f exec=${(t3 - t2) / 1e9}%6.2f  ($n rows)")
    }
    spark.stop()
  }
}
