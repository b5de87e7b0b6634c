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
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate("probe-jobs")
    spark.sparkContext.setLogLevel("WARN")
    def force(): Unit = SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    force() // warmup: JIT + codegen + footer cache
    spark.catalog.clearCache(); System.gc(); Thread.sleep(2000)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Double, String)]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .map(_.getProperty("callSite.short", "?")).getOrElse("?")
        jobs.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, site) =>
          done.add((je.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
      }
    })
    val t0 = System.nanoTime()
    force()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the last JobEnd event drain
    var acc = 0.0
    done.forEach { case (id, d, site) =>
      acc += d
      println(f"job $id%4d  $d%7.3f s  $site")
    }
    println(f"$name: total $total%.2f s, ${done.size} jobs, job-time sum $acc%.2f s")
    spark.stop()
  }
}
