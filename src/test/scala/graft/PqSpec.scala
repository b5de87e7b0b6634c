package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

/** Product-quantization ANN: code validity, bit-determinism under
  * repartitioning, ADC score fidelity, and recall vs brute-force cosine.
  */
class PqSpec extends SparkSpec {

  private lazy val embs =
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("codes are in range and one per subspace") {
    val cb = Pq.train(embs, "embedding", "vec_id", m = 8, ksub = 16, iters = 2)
    assert(cb.cents.length == 8 && cb.cents.forall(_.length == 16))
    assert(cb.dsub == 8)
    val codes = Pq.encode(embs, "embedding", "vec_id", cb)
    val bad = codes.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(bad == 0L)
  }

  test("training and encoding are bit-identical under repartitioning") {
    def run(parts: Int): Array[String] = {
      val df = embs.repartition(parts)
      val cb = Pq.train(df, "embedding", "vec_id", m = 8, ksub = 16, iters = 2)
      Pq.encode(df, "embedding", "vec_id", cb)
        .select(col("vec_id"), col("codes").cast("string"))
        .orderBy("vec_id").collect().map(_.mkString("|"))
    }
    assert(run(2).sameElements(run(7)))
  }

  test("ADC score approximates true cosine on unit vectors") {
    val cb = Pq.train(embs, "embedding", "vec_id", m = 8, ksub = 16, iters = 3)
    val enc = Pq.encode(embs, "embedding", "vec_id", cb)
    val queries = embs.filter(col("vec_id") < 5)
    val adc = Pq.topK(enc, queries, "embedding", "vec_id", k = 50, cb)
    // join ADC scores back to exact cosines for the same pairs
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = embs.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val err = adc.join(q, "query_id").join(c, "neighbor_id")
      .select(abs(col("score") - graft.functions.cosine_similarity(col("qv"), col("cv"))).as("e"))
      .agg(avg("e"), max("e")).head()
    assert(err.getDouble(0) < 0.15, s"mean ADC error ${err.getDouble(0)}")
    assert(err.getDouble(1) < 0.5, s"max ADC error ${err.getDouble(1)}")
  }

  test("IVFADC: cell probe is an equi hash join; refined recall holds") {
    val queries = embs.filter(col("vec_id") < 10)
    val df = Pq.ivfAdcTopK(embs, queries, "embedding", "vec_id", k = 10,
      nlist = 8, nprobe = 4, m = 8, ksub = 16, iters = 2, shortlist = 50)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    val bf = Similarity.bruteForceTopK(embs, queries, "embedding", "vec_id", k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect got).size.toDouble / bf.size
    // nprobe 4 of 8 cells: candidates bounded to ~half the corpus, yet
    // the probed+refined recall stays useful
    assert(recall >= 0.3, s"IVFADC recall $recall")
  }

  test("recall@10 vs brute-force cosine top-10: ADC floor, refine recovers") {
    val queries = embs.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(embs, queries, "embedding", "vec_id", k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(m: Int, ksub: Int, shortlist: Int): Double = {
      val pq = Pq.pqTopK(embs, queries, "embedding", "vec_id", k = 10,
        m = m, ksub = ksub, iters = 3, shortlist = shortlist)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (bf intersect pq).size.toDouble / bf.size
    }
    val adc = recallOf(8, 16, 0)
    assert(adc >= 0.15, s"pure-ADC recall $adc over ${bf.size} true pairs")
    val refined = recallOf(8, 16, 50)
    assert(refined >= adc, s"refine must not lose recall: $refined < $adc")
    assert(refined >= 0.5, s"refined recall $refined (ADC was $adc)")
    // finer codebooks (dsub=4, 32 codes) cut quantization distortion:
    // near-synthetic 64-d vectors have tiny cosine margins, the PQ
    // worst case, and still reach high recall with a 5x shortlist
    val fine = recallOf(16, 32, 50)
    assert(fine >= 0.75, s"fine-codebook refined recall $fine")
  }
}
