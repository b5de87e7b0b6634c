package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.BatchEtl
import graft.warehouse.Warehouse

/** End-to-end demo of the reference-parity pipeline (the Spark-first
  * equivalent of the reference's `etl_batch.main()`): writes two noisy CSVs,
  * runs the batch ETL twice (second run must insert 0 — idempotence), and
  * prints per-run audit metrics plus the per-city aggregate readback.
  *
  * Usage: runMain graft.Demo [workDir]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(Files.createTempDirectory("graft_demo").toString)
    val in = s"$work/in"
    Files.createDirectories(Paths.get(in))
    Files.writeString(Paths.get(s"$in/lote1.csv"),
      "nombre,edad,ciudad\n  walter ,26,SAN LUCAS\nRAMONA,52,san lucas\nhector,treinta,Cali\nana,23, valle alto\nluz,30,valle alto\n")
    Files.writeString(Paths.get(s"$in/lote2.csv"),
      "nombre,edad,ciudad\nWalter,26,San Lucas\nnuria,44,cali\n")

    val spark = GraftSession.getOrCreate("graft-demo", cores = 4)
    val wh = new Warehouse(spark, s"$work/warehouse")
    val etl = new BatchEtl(spark, wh)

    println(s"== run 1 (input: $in)")
    etl.run(in, rejectDir = Some(s"$work/rejects")).foreach(r => println(s"  $r"))
    println("== run 2 (same input — idempotent, expect insertedNew=0)")
    etl.run(in).foreach(r => println(s"  $r"))

    println("== personas por ciudad (A2 readback)")
    etl.cityAggregate().show(truncate = false)
    println("== etl_runs audit")
    wh.read("etl_runs").orderBy("run_id").show(truncate = false)
    spark.stop()
  }
}
