package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only job profiler: runs one query (warmup + 1 measured run) and
  * prints every Spark job the measured run launched — duration and the
  * call site that triggered it. The fastest way to see whether a query's
  * wall clock is one big stage or thirty sequential model-sized jobs
  * (guide §1: decide empirically what to optimize before touching code).
  *
  * Usage: runMain graft.ProbeJobs <query> [sfDir]
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val spark = GraftSession.getOrCreate("probe-jobs")
    spark.sparkContext.setLogLevel("WARN")
    // experiment hook: GRAFT_PROBE_AQE=false times queries with adaptive
    // execution off (results identical; plan/job shape differs)
    sys.env.get("GRAFT_PROBE_AQE")
      .foreach(v => spark.conf.set("spark.sql.adaptive.enabled", v))
    def force(name: String): Unit = SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Double, String)]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobs.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, site) =>
          done.add((je.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
      }
    })
    names.foreach { name =>
      try force(name) catch { case _: Throwable => () } // warmup
      spark.catalog.clearCache(); System.gc(); Thread.sleep(1000)
      done.clear()
      val t0 = System.nanoTime()
      force(name)
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // let the last JobEnd event drain
      var acc = 0.0
      val byDur = new java.util.ArrayList[(Int, Double, String)](done)
      byDur.forEach { case (_, d, _) => acc += d }
      val top = {
        import scala.jdk.CollectionConverters._
        byDur.asScala.sortBy(-_._2).take(8)
          .map { case (id, d, _) => f"j$id=$d%.2f" }.mkString(" ")
      }
      println(f"PROBE $name: total $total%.2f s, ${byDur.size} jobs, " +
        f"sum $acc%.2f s | top: $top")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
