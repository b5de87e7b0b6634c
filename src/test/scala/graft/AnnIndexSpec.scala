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

  test("append routes with frozen centroids: index == rebuilt-from-union query surface") {
    val (all, qs) = fixture()
    val base = all.filter(col("vec_id") % 3 =!= 0L)
    val late = all.filter(col("vec_id") % 3 === 0L && col("vec_id") >= 10L)
    val dir = tempDir("annidx3")
    AnnIndex.buildIvf(base, "embedding", "vec_id", dir, nlist = 8, iters = 5)
    AnnIndex.appendIvf(late, "embedding", "vec_id", dir)
    val appended = AnnIndex.queryIvf(spark, dir, qs, "embedding", "vec_id",
        k = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    // reference: one in-memory pass over base ∪ late using the SAME
    // centroids (trained on base only) — appendIvf must not retrain
    val centsDf = spark.read.parquet(s"$dir/centroids")
    val union = base.unionByName(late)
    val dir2 = tempDir("annidx4")
    centsDf.write.parquet(s"$dir2/centroids")
    Similarity.ivfRoute(union, centsDf, "embedding", "vec_id")
      .write.partitionBy("cell_id").parquet(s"$dir2/corpus")
    val rebuilt = AnnIndex.queryIvf(spark, dir2, qs, "embedding", "vec_id",
        k = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(appended == rebuilt)
    assert(appended.nonEmpty)
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
