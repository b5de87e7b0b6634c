package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.{cosine_similarity, srp_signature}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths, as a large corpus demands:
  *
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
  *    set against the corpus, one map-side pass computes similarities with
  *    graft's codegen'd cosine expression, then a per-query top-k. The
  *    baseline and the verifier for the approximate path.
  *  - [[srpTopK]] — sign-random-projection LSH: corpus and queries are
  *    bucketed by `tables` independent bit-signatures; a query only scores
  *    vectors sharing a bucket in some table. At 100 TB the bucket join
  *    shuffles a small fraction of the corpus per query instead of
  *    scanning all of it; recall is tunable via (bits, tables).
  *
  * Top-k selection uses a window ranked by (similarity DESC, id) — ties
  * break deterministically.
  */
object Similarity {

  /** Exact top-k: every (query, candidate) pair is scored.
    * `queries` must be broadcast-sized (it is the driver of the cross
    * product; the corpus side streams through map-side).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
                     idCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val c = graft.Tables.fanOut(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine_similarity(col("q_vec"), col("c_vec")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    rankTopK(scored, k)
  }

  /** Per-query top-k via graft's TopKPerKey operator: map-side bounded
    * heaps, then a shuffle of at most k rows per (query, map task) — the
    * full candidate set is never sorted or shuffled (see
    * graft.plans.TopKPerKey). The rank window afterwards runs on ≤ k rows
    * per key, already co-partitioned by the operator's exchange.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val top = graft.plans.TopK.perKey(scored, Seq(col("query_id")),
      Seq(col("cosine").desc, col("neighbor_id").asc), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Approximate top-k via SRP-LSH bucketing. */
  def srpTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, k: Int, bits: Int = 8, tables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String) = {
      val bucketKeys = array((0 until tables).map { t =>
        concat_ws(":", lit(t), srp_signature(col(vec), bits, seed = 7L + t))
      }: _*)
      df.select(col(id), col(vec), explode(bucketKeys).as("bucket"))
    }

    val c = bucketed(
      graft.Tables.fanOut(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))),
      "neighbor_id", "c_vec")
    val q = broadcast(bucketed(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      "query_id", "q_vec"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates(Seq("query_id", "neighbor_id"))
      .withColumn("cosine", cosine_similarity(col("q_vec"), col("c_vec")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    rankTopK(scored, k)
  }

  /** IVF-style coarse quantization: assign every vector to its nearest of
    * `nlist` pivot vectors (chosen deterministically from the corpus), so
    * queries probe only their `nprobe` closest cells. The partitioned
    * corpus can be written bucketed-by-cell so the probe is a pruned scan.
    */
  def ivfAssign(corpus: DataFrame, vecCol: String, idCol: String,
                spark: SparkSession, nlist: Int): DataFrame = {
    // deterministic pivots: the nlist lowest id-hashes — a uniform sample
    // under any id distribution (sparse/filtered ids included), computed as
    // a TakeOrdered (no global window, no full sort materialization), with
    // the id as tie-break so the choice is total-order deterministic
    val pivots = corpus.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(nlist)
      .select(col(idCol).as("pivot_id"), col(vecCol).as("pivot_vec"))
    val assigned = corpus.crossJoin(broadcast(pivots))
      .withColumn("sim", cosine_similarity(col(vecCol), col("pivot_vec")))
    val byVec = Window.partitionBy(col(idCol)).orderBy(col("sim").desc, col("pivot_id"))
    assigned
      .withColumn("__r", row_number().over(byVec))
      .filter(col("__r") === 1)
      .select(col(idCol), col(vecCol), col("pivot_id").as("cell_id"))
  }
}
