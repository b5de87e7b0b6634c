package graft

import graft.streaming.IncrementalStream
import graft.warehouse.Warehouse

/** Structured-Streaming incremental load: AvailableNow drains the input
  * directory; re-running with a fresh checkpoint re-delivers everything and
  * the warehouse still converges (idempotent append = the state).
  */
class StreamingSpec extends SparkSpec {

  test("file-stream incremental load is idempotent across re-delivery") {
    val in = tempDir("sin")
    val wh = new Warehouse(spark, tempDir("swh"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/a.csv"),
      "nombre,edad,ciudad\nwalter,26,san lucas\nana,23,cali\nluz,30,cali\n")

    val q1 = IncrementalStream.run(spark, wh, in, tempDir("ck1"))
    q1.awaitTermination()
    assert(wh.read("personas_limpias").count() == 2) // ana under-age rejected

    // new file arrives; fresh checkpoint also re-reads a.csv (re-delivery)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b.csv"),
      "nombre,edad,ciudad\nWalter,26,San Lucas\nnuria,44,cali\n")
    val q2 = IncrementalStream.run(spark, wh, in, tempDir("ck2"))
    q2.awaitTermination()

    val fact = wh.read("personas_limpias")
    assert(fact.count() == 3) // walter deduped across delivery + re-delivery
    assert(wh.read("etl_runs").count() >= 2)
  }
}
