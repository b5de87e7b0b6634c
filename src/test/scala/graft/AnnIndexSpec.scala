package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Similarity}

/** Persisted IVF index: results must be bit-identical to the in-memory
  * trained path, and probes must prune cell partitions at the scan.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def fixture() = {
    val all = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = all.filter(col("vec_id") < 10)
    (all, qs)
  }

  test("persisted query == in-memory ivfTopKTrained, bit for bit") {
    val (all, qs) = fixture()
    val dir = tempDir("annidx")
    AnnIndex.buildIvf(all, "embedding", "vec_id", dir, nlist = 8, iters = 5)
    val persisted = AnnIndex.queryIvf(spark, dir, qs, "embedding", "vec_id",
        k = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    val inMemory = Similarity.ivfTopKTrained(all, qs, "embedding", "vec_id",
        k = 5, nlist = 8, iters = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(persisted == inMemory)
    assert(persisted.nonEmpty)
  }

  test("probe scan prunes cell partitions") {
    val (all, qs) = fixture()
    val dir = tempDir("annidx2")
    AnnIndex.buildIvf(all, "embedding", "vec_id", dir, nlist = 8, iters = 5)
    val one = qs.filter(col("vec_id") === 0L)
    val df = AnnIndex.queryIvf(spark, dir, one, "embedding", "vec_id",
      k = 5, nprobe = 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [cell_id"), p.take(1200))
    // one query probing 2 of 8 cells: the scan reads at most 2 partition
    // directories, not the whole index
    val scanned = "partitions read: (\\d+)".r.findFirstMatchIn(p)
    scanned.foreach(m => assert(m.group(1).toInt <= 2, p.take(1200)))
  }
}
