package graft

/** Throwaway single-query timer (dev only): runMain graft.TimeQ <name> [sfDir] */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate("time-q")
    spark.sparkContext.setLogLevel("WARN")
    def force(): Unit = SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    force()
    val times = (1 to 2).map { _ =>
      spark.catalog.clearCache()
      // flush unreferenced cache/checkpoint blocks NOW: the ContextCleaner
      // otherwise removes them asynchronously inside the next measurement
      System.gc(); Thread.sleep(2000)
      val t0 = System.nanoTime(); force(); (System.nanoTime() - t0) / 1e9
    }
    println(f"$name: min ${times.min}%.2f s (runs: ${times.map(t => f"$t%.2f").mkString(", ")})")
    spark.stop()
  }
}
