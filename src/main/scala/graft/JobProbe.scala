package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev harness: run one registered query and print every Spark JOB it
  * launched — duration, task count, and the first line of the call site —
  * so multi-action registrations (the DML/lakehouse setups) can be
  * decomposed without the UI. Not part of the driver contract.
  *
  * Usage: JobProbe <sfDir> <query> [repeat]
  */
object JobProbe {
  private case class JobRow(id: Int, start: Long, var end: Long = -1,
                            var site: String = "", var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val q = args(1)
    val repeats = if (args.length > 2) args(2).toInt else 2
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
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val row = JobRow(e.jobId, e.time)
        row.site = Option(e.properties.getProperty("spark.job.description"))
          .orElse(Option(e.properties.getProperty("callSite.short")))
          .getOrElse("")
        row.tasks = e.stageInfos.map(_.numTasks).sum
        jobs.put(e.jobId, row)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
    })
    // warmup at sf0.001 (mimic Bench)
    sys.env.get("PROBE_WARM_DIR").foreach { wd =>
      try SparkEntry.queries(q)(spark, wd).count()
      catch { case _: Throwable => () }
      graft.util.Caches.releaseAll()
      spark.catalog.clearCache()
    }
    (1 to repeats).foreach { i =>
      jobs.clear()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.util.Caches.releaseAll()
      spark.catalog.clearCache()
      import scala.jdk.CollectionConverters._
      val rows = jobs.values.asScala.toSeq.sortBy(_.start)
      val sum = rows.filter(_.end > 0).map(r => r.end - r.start).sum / 1e3
      println(f"== run$i $q wall=$wall%.2f s  jobs=${rows.size} jobSum=$sum%.2f s  rows=$n")
      rows.foreach { r =>
        val d = if (r.end > 0) (r.end - r.start) / 1e3 else -1.0
        println(f"  job ${r.id}%4d ${d}%7.3f s tasks=${r.tasks}%4d  ${r.site}")
      }
    }
    spark.stop()
  }
}
