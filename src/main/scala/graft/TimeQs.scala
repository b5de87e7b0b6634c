package graft

/** Dev-only multi-query timer for same-window A/B runs: one JVM, a list
  * of query names — warmup pass over all, then `reps` measured passes
  * (pass-interleaved, the Bench protocol), min per query printed as ONE
  * JSON line. Run alternately from two build trees to produce the
  * AB_rNN.json interleaved pairs without paying a JVM start per query.
  *
  * Usage: runMain graft.TimeQs <sfDir> <reps> <query> [query ...]
  */
object TimeQs {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = GraftSession.getOrCreate("time-qs")
    spark.sparkContext.setLogLevel("WARN")
    def force(name: String): Unit = SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    names.foreach { n => // warmup: JIT + codegen + footer cache
      try force(n) catch { case _: Throwable => () }
      spark.catalog.clearCache(); System.gc()
    }
    val best = scala.collection.mutable.Map.empty[String, Double]
    (1 to reps).foreach { _ =>
      names.foreach { n =>
        val t = try {
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          force(n)
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
        spark.catalog.clearCache(); System.gc()
        if (t >= 0)
          best(n) = best.get(n).filter(_ >= 0).map(math.min(_, t)).getOrElse(t)
        else if (!best.contains(n)) best(n) = -1.0
      }
    }
    val qs = names.map(n => "\"" + n + "\":" + best(n)).mkString("{", ",", "}")
    println(s"""TIMEQS $qs""")
    spark.stop()
  }
}
