package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.cosine_similarity

/** Persisted IVF ANN index — the production shape of approximate search
  * at corpus scale: train ONCE, write the index, answer every query from
  * the written artifact. The in-memory operators (Similarity.ivfTopK*)
  * re-train and re-route per invocation, which is right for a one-shot
  * job and wrong for a query service over 100 TB; this operator splits
  * the lifecycle:
  *
  *   - [[buildIvf]] — Lloyd-train `nlist` centroids, float-cast them
  *     ONCE into `dir/centroids` (the exact table the query path
  *     reloads — routing is bit-identical across the persistence
  *     boundary), route the corpus map-only to its nearest cell, and
  *     write it `partitionBy(cell_id)`.
  *   - [[queryIvf]] — reload the centroid table (nlist rows — bounded
  *     collect), probe the `nprobe` nearest cells per query, and read
  *     ONLY those cells' partitions: the `cell_id IN (...)` filter is a
  *     partition-directory prune, so a 100 TB index reads
  *     nprobe/nlist of its bytes per query batch, before any row is
  *     deserialized. Scoring inside probed cells is the same broadcast
  *     join + codegen cosine as the in-memory path.
  *
  * AnnIndexSpec pins (a) persisted results ≡ in-memory ivfTopKTrained
  * bit-for-bit, and (b) the PartitionFilters prune in the scan plan.
  */
object AnnIndex {

  /** Train and persist: `dir/centroids` (cell_id, pv float vector) and
    * `dir/corpus` partitioned by cell_id.
    */
  def buildIvf(corpus: DataFrame, vecCol: String, idCol: String, dir: String,
               nlist: Int, iters: Int): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = Clustering.kmeans(corpus, vecCol, idCol, nlist, iters)
    val centDf = cents.zipWithIndex
      .map { case (cv, c) => (c.toLong, cv.map(_.toFloat).toSeq) }
      .toSeq.toDF("cell_id", "pv")
    centDf.write.mode("overwrite").parquet(s"$dir/centroids")
    Similarity.ivfRoute(corpus, centDf, vecCol, idCol)
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$dir/corpus")
  }

  /** Incremental index maintenance: route NEW vectors with the
    * already-persisted centroids (no retraining — the index's routing
    * contract is frozen at build time, which is exactly what keeps old
    * and new rows comparable) and append them into the same cell
    * partitions. Dynamic partition append touches only the cells the new
    * vectors land in; existing files are never rewritten. Re-train (a
    * fresh buildIvf) when drift makes the frozen centroids a bad coarse
    * quantizer — that is a policy decision the caller owns, measurable
    * with Pca/warehouse_drift.
    */
  def appendIvf(newVectors: DataFrame, vecCol: String, idCol: String,
                dir: String): Unit = {
    val spark = newVectors.sparkSession
    val cents = spark.read.parquet(s"$dir/centroids")
    Similarity.ivfRoute(newVectors, cents, vecCol, idCol)
      .write.mode("append").partitionBy("cell_id")
      .parquet(s"$dir/corpus")
  }

  /** Top-k per query against a persisted index. `queries` must be
    * broadcast-sized (the same contract as every graft ANN query path);
    * the probed-cell collect is bounded by |queries|·nprobe.
    */
  def queryIvf(spark: SparkSession, dir: String, queries: DataFrame,
               vecCol: String, idCol: String, k: Int, nprobe: Int): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids")
    val qCells = Similarity.ivfProbeCells(queries, cents, vecCol, idCol, nprobe)
    val probed = qCells.select("cell_id").distinct()
      .collect().map(_.getLong(0)).sorted // bounded: |queries| * nprobe
    val corpus = spark.read.parquet(s"$dir/corpus")
      .filter(col("cell_id").isin(probed: _*))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), col("cell_id"))
      .join(broadcast(qCells), Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine_similarity(col("q_vec"), col("c_vec")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    Similarity.rankTopK(scored, k)
  }
}
