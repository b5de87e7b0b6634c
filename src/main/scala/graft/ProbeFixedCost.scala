package graft

/** One-off diagnostic main: break a query's wall time into plan-build,
  * physical-planning, and execution, to locate per-query fixed cost.
  * Not part of the driver contract.
  */
object ProbeFixedCost {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate("probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("s1_literal_scan", "ev_json_extract", "sql_readback", "q1_pricing_summary")
    names.foreach { n => // warmup
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    (1 to 2).foreach { _ =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+physical
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"PROBE $n%-22s build ${(t1 - t0) / 1e3}%8.0f us  plan ${(t2 - t1) / 1e3}%8.0f us  exec ${(t3 - t2) / 1e3}%8.0f us")
      }
    }
    spark.stop()
  }
}
