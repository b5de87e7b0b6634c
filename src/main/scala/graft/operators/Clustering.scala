package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.cosine_similarity_fd

/** Distributed k-means (Lloyd's algorithm) over embedding columns, plus the
  * SemDeDup-style semantic deduplication built on it.
  *
  * Scale shape — each Lloyd iteration is two map-side-friendly jobs:
  *
  *  1. ASSIGN: centroids are k×dim doubles — bounded by construction — so
  *     they are embedded as a literal array in the plan (the "broadcast the
  *     centers" move, same as [[Similarity.ivfTopK]]'s pivots). Assignment
  *     is a pure projection over the scan: no join, no shuffle.
  *  2. UPDATE: per-(cell, dim) sums via `posexplode` + hash aggregate. The
  *     explode widens rows ×dim map-side, but partial aggregation collapses
  *     each task's output to ≤ k×dim rows before the exchange, so shuffle
  *     volume is O(tasks × k × dim) regardless of corpus size. The k×dim
  *     result (≤ a few thousand values) is collected to the driver for the
  *     next iteration's literal — the only driver touch, bounded by k·dim.
  *
  * Determinism & oracle parity — centroid arithmetic runs on a 2^-20
  * integer grid: each float coordinate contributes `floor(x · 2^20)` to a
  * BIGINT sum. A float times a power of two is EXACT in IEEE arithmetic and
  * `floor` is exact, so the per-cell sums are integers computed identically
  * under any partitioning — and identically by the DuckDB oracle. The
  * centroid coordinate is then the single double division
  * `sum / (n · 2^20)`. Plain double sums would be partition-order-dependent;
  * decimal casts of arbitrary floats tie-break differently across engines
  * (HALF_UP vs HALF_EVEN); the integer grid has neither problem. The grid
  * costs ~1e-6 absolute precision per coordinate — irrelevant at k-means
  * granularity — and is declared part of the operator's contract.
  *
  * Seeding is the deterministic md5-order scheme shared with
  * [[Similarity.ivfPivots]]: cells 0..k-1 are the first k vectors in
  * `(int24(md5(id)), id)` order — portable to ANSI SQL, stable across runs.
  */
object Clustering {

  /** Centroid grid: 2^20. Float × 2^20 is exact; floor of it is exact. */
  val Grid = 1048576L

  /** Deterministic seed centroids: the first k vectors in md5-hash order
    * (exactly [[Similarity.ivfPivots]]'s scheme), as driver-side doubles.
    * Bounded collect: k rows.
    */
  def seedCentroids(df: DataFrame, vecCol: String, idCol: String, k: Int): Array[Array[Double]] =
    df.select(col(idCol), col(vecCol))
      .orderBy(conv(substring(md5(col(idCol).cast("string")), 1, 6), 16, 10).cast("long"),
        col(idCol))
      .limit(k)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)

  /** Centroids as a literal `array<struct<c:int, cv:array<double>>>`. */
  private def centroidLiteral(cents: Array[Array[Double]]): Column =
    array(cents.toIndexedSeq.zipWithIndex.map { case (cv, i) =>
      struct(lit(i).as("c"), typedLit(cv.toSeq).as("cv"))
    }: _*)

  /** Highest-cosine cell per row, ties toward the lowest cell id — the
    * struct field order (sim, −c, c) makes `array_max` a deterministic
    * total-order argmax, identical to the oracle's
    * `row_number() ORDER BY cos DESC, c ASC`.
    */
  private def nearestCell(vec: Column, cl: Column): Column =
    array_max(transform(cl, p => struct(
      cosine_similarity_fd(vec, p("cv")).as("sim"),
      (-p("c")).as("negc"),
      p("c").as("c"))))("c")

  /** Map-only assignment of every vector to its nearest centroid. */
  def assign(df: DataFrame, vecCol: String, idCol: String,
             cents: Array[Array[Double]]): DataFrame =
    df.select(col(idCol), col(vecCol),
      nearestCell(col(vecCol), centroidLiteral(cents)).as("cell_id"))

  /** One Lloyd iteration: assign, then per-cell elementwise mean on the
    * integer grid. Cells that lose every member keep their previous
    * centroid (standard empty-cell rule, mirrored by the oracle).
    */
  def lloydStep(df: DataFrame, vecCol: String, idCol: String,
                cents: Array[Array[Double]]): Array[Array[Double]] = {
    val k = cents.length
    val updated = assign(df, vecCol, idCol, cents)
      .select(col("cell_id"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("cell_id"), col("dim"))
      .agg(sum(floor(col("x").cast("double") * Grid).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .collect() // ≤ k×dim rows — bounded by construction
      .groupBy(_.getInt(0))
      .map { case (cell, rows) =>
        val dim = cents(cell).length
        val cv = new Array[Double](dim)
        rows.foreach { r =>
          cv(r.getInt(1)) = r.getLong(2).toDouble / (r.getLong(3).toDouble * Grid)
        }
        cell -> cv
      }
    Array.tabulate(k)(c => updated.getOrElse(c, cents(c)))
  }

  /** k-means: deterministic seeds + `iters` Lloyd iterations. Returns the
    * final centroids; chain with [[assign]] for the final partition of the
    * corpus. Each iteration is its own bounded Spark job (see the scale
    * notes above); `iters` is small by k-means practice (the driver loop
    * is over iterations, never over data).
    */
  def kmeans(df: DataFrame, vecCol: String, idCol: String, k: Int,
             iters: Int): Array[Array[Double]] = {
    var cents = seedCentroids(df, vecCol, idCol, k)
    var i = 0
    while (i < iters) { cents = lloydStep(df, vecCol, idCol, cents); i += 1 }
    cents
  }

  /** Trained-centroid k-means as a flat DataFrame — (cell_id, dim, cval,
    * n_members): the centroid coordinates after `iters` iterations plus
    * each cell's final population. Flat scalars so the result is directly
    * oracle-comparable.
    */
  def kmeansFlat(df: DataFrame, vecCol: String, idCol: String, k: Int,
                 iters: Int): DataFrame = {
    val cents = kmeans(df, vecCol, idCol, k, iters)
    val spark = df.sparkSession
    import spark.implicits._
    val flat = cents.zipWithIndex.flatMap { case (cv, c) =>
      cv.zipWithIndex.map { case (v, d) => (c, d, v) }
    }.toSeq.toDF("cell_id", "dim", "cval")
    val members = assign(df, vecCol, idCol, cents)
      .groupBy("cell_id").agg(count(lit(1)).as("n_members"))
    flat.join(broadcast(members), Seq("cell_id"), "left")
      .select(col("cell_id"), col("dim"), round(col("cval"), 9).as("cval"),
        coalesce(col("n_members"), lit(0L)).as("n_members"))
  }

  /** SemDeDup-style semantic deduplication: partition the corpus into
    * k-means cells, then within each cell drop every vector that has a
    * LOWER-id cell-mate with cosine ≥ `threshold` ("dominated by smaller
    * id" — a deterministic, order-free variant of SemDeDup's greedy
    * ε-ball sweep; the survivor set is identical for transitive duplicate
    * clusters and declared as the operator's semantics otherwise).
    *
    * The pairwise check never leaves a cell, so the join key is the cell
    * id; `maxCluster` caps the population a cell may contribute to the
    * self-join (the [[Dedup.dropHotKeys]] skew guard — one degenerate
    * mega-cluster must not go quadratic). Vectors in capped cells are
    * conservatively KEPT — dedup may under-delete, never over-delete.
    * Emits one row per vector: (id, cell_id, kept).
    */
  /** Per-cell PROTOTYPE selection — the coreset/distillation move: cover
    * the embedding space with k-means cells, then keep each cell's `n`
    * most-representative members (highest cosine to the cell's OWN
    * centroid). Complements [[semanticDedup]] (which removes redundancy)
    * by selecting FOR coverage: every region of the space contributes,
    * no region dominates.
    *
    * Scale shape: Lloyd training is the [[kmeans]] bounded-artifact
    * loop; assignment and the cosine-to-own-centroid score are ONE
    * map-only projection (`element_at` into the k-bounded centroid
    * literal — no join); per-cell top-n runs through the TopKPerKey
    * bounded heaps (≤ n rows per cell per task reach the shuffle, never
    * a corpus window sort). The final rank window touches ≤ k·n rows.
    *
    * Output: (idCol, cell_id, rank, centroid_cos), rank 1..n per cell.
    */
  def prototypes(df: DataFrame, vecCol: String, idCol: String, k: Int,
                 iters: Int, n: Int): DataFrame = {
    val cents = kmeans(df, vecCol, idCol, k, iters)
    val cl = centroidLiteral(cents)
    val scored = df.select(col(idCol), col(vecCol),
        nearestCell(col(vecCol), cl).as("cell_id"))
      .withColumn("centroid_cos", graft.functions.cosine_similarity_fd(
        col(vecCol), element_at(cl, col("cell_id").cast("int") + 1)("cv")))
      .select(col(idCol), col("cell_id"), col("centroid_cos"))
    val top = graft.plans.TopK.perKey(scored, Seq(col("cell_id")),
      Seq(col("centroid_cos").desc, col(idCol).asc), n)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cell_id"))
      .orderBy(col("centroid_cos").desc, col(idCol))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col(idCol), col("cell_id"), col("rank"),
        round(col("centroid_cos"), 6).as("centroid_cos"))
  }

  /** Topic discovery over RAW TEXT — the unsupervised "what is in this
    * corpus" view, model-free end to end: k-means over hashed
    * embeddings ([[Similarity.hashEmbed]] — the deterministic
    * text→vector bridge), each cluster labeled by its top-`topn` tokens
    * by WITHIN-CLUSTER document frequency (ties token asc). Not LDA —
    * a bag-of-words clustering whose labels are exact corpus
    * statistics, which is what makes it oracle-checkable and cheap: one
    * token explode for the embeddings, the k-means loop on the
    * doc-count-sized hashed table, one distinct-token pass joined to
    * the nlist-bounded assignment, TopKPerKey bounded heaps.
    *
    * Output: (cell_id, rank, token, df) — the reading sheet of a
    * corpus nobody has labeled.
    */
  def textTopics(docs: DataFrame, textCol: String, idCol: String,
                 dim: Int, k: Int, iters: Int, topn: Int,
                 salt: String): DataFrame = {
    // hashed vectors feed BOTH the training loop and the final
    // assignment — pin them once (eager; blocks reclaimed with the
    // lazy result by the ContextCleaner)
    val emb = Similarity.hashEmbed(docs, textCol, idCol, dim, salt)
      .localCheckpoint(true)
    val cents = kmeans(emb, "embedding", idCol, k, iters)
    val cl = centroidLiteral(cents)
    val assigned = emb.select(col(idCol),
      nearestCell(col("embedding"), cl).as("cell_id"))
    val toks = graft.Tables.fanOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .distinct() // document frequency, not occurrence count
    val counts = toks.join(assigned, Seq(idCol))
      .groupBy(col("cell_id"), col("token")).agg(count(lit(1)).as("df"))
    val top = graft.plans.TopK.perKey(counts, Seq(col("cell_id")),
      Seq(col("df").desc, col("token").asc), topn)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cell_id"))
      .orderBy(col("df").desc, col("token"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("cell_id"), col("rank"), col("token"), col("df"))
  }

  def semanticDedup(df: DataFrame, vecCol: String, idCol: String, k: Int,
                    iters: Int, threshold: Double,
                    maxCluster: Int = 100000): DataFrame = {
    val cents = kmeans(df, vecCol, idCol, k, iters)
    // materialize once before the self-join's two consumers — eager
    // localCheckpoint (the kept/dominated result is lazy; no unpersist
    // site, ContextCleaner reclaims the blocks with the result)
    val assigned = assign(df, vecCol, idCol, cents).localCheckpoint(true)
    val inJoin = Dedup.dropHotKeys(assigned, "cell_id", maxCluster)
    val a = inJoin.select(col("cell_id"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = inJoin.select(col("cell_id"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    val dominated = a.join(b, Seq("cell_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(graft.functions.cosine_similarity(col("va"), col("vb")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    assigned.select(col(idCol), col("cell_id"))
      .join(dominated.withColumn("__dom", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cell_id"), col("__dom").isNull.as("kept"))
  }
}
