package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.{adc_score, pq_encode}

/** Product quantization (PQ) for approximate-nearest-neighbor search — the
  * memory-bound scale path of the ANN family ([[Similarity]] holds the
  * brute-force / SRP-LSH / IVF paths).
  *
  * The vector is split into `m` subspaces of `dsub = dim / m` coordinates;
  * each subspace gets its own `ksub`-centroid codebook (classical k-means,
  * squared-L2 metric). A corpus vector is then stored as `m` small codes —
  * 8 bytes instead of `4 · dim` — and query scoring is asymmetric distance
  * computation (ADC): the query precomputes its dot product against every
  * codebook centroid ONCE (an `m × ksub` lookup table), and scoring a
  * corpus vector is `m` table lookups, no float math at all.
  *
  * Scale shape:
  *
  *  - TRAIN ([[train]]): all `m` sub-quantizers advance together — each
  *    Lloyd iteration is ONE job over the corpus (codes for every subspace
  *    are computed in a single projection, and the per-(subspace, code,
  *    dim) sums partial-aggregate map-side to ≤ m·ksub·dsub = dim·ksub
  *    rows). The bounded result collects to the driver for the next
  *    iteration's literal, exactly the [[Clustering]] discipline.
  *  - ENCODE ([[encode]]): map-only projection; codebooks enter the plan
  *    as literals (the "broadcast the centers" move). The encoded corpus
  *    is 32×+ smaller than the raw vectors — at 100 TB of embeddings this
  *    is the difference between an in-memory candidate sweep and a disk
  *    scan.
  *  - SCORE ([[topK]]): queries are bounded by construction, so their ADC
  *    lookup tables are computed driver-side and broadcast; the corpus
  *    side streams its code rows through a map-only lookup-sum, and
  *    per-query top-k runs through [[graft.plans.TopK.perKey]] (bounded
  *    heaps, ≤ k rows per key cross the wire — never a full sort).
  *
  * Determinism: codebook arithmetic uses the [[Clustering.Grid]] integer
  * grid (partition-invariant sums), seeds are the md5-order scheme shared
  * with [[Similarity.ivfPivots]], argmin ties break toward the lowest code,
  * and ADC sums run in fixed subspace order — the whole pipeline is
  * bit-stable under any partitioning (pinned in PqSpec).
  *
  * Inner-product ADC equals cosine ranking because the corpus embeddings
  * are unit-norm (asserted against brute-force cosine recall in PqSpec).
  */
object Pq {

  /** Trained PQ model: `cents(s)(j)` = centroid j of subspace s. */
  final case class Codebooks(m: Int, ksub: Int, dsub: Int,
                             cents: Array[Array[Array[Double]]])

  /** Subspace `s` (0-based, lambda-var Column) of `vec`. */
  private def subVec(vec: Column, s: Column, dsub: Int): Column =
    slice(vec, s * lit(dsub) + lit(1), lit(dsub))

  /** Deterministic seeds: sub-slices of the first `ksub` vectors in
    * md5-id order (the [[Clustering.seedCentroids]] scheme; one bounded
    * collect serves every subspace).
    */
  def seedCodebooks(df: DataFrame, vecCol: String, idCol: String,
                    m: Int, ksub: Int): Codebooks = {
    val seeds = df.select(col(idCol), col(vecCol))
      .orderBy(conv(substring(md5(col(idCol).cast("string")), 1, 6), 16, 10).cast("long"),
        col(idCol))
      .limit(ksub)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    Codebooks(m, ksub, dsub,
      Array.tabulate(m)(s => seeds.map(_.slice(s * dsub, (s + 1) * dsub))))
  }

  /** One fused Lloyd step over every subspace: a single corpus job. The
    * explode widens rows ×(m + dim) map-side, but partial aggregation
    * collapses each task's output to ≤ dim·ksub rows before the exchange
    * — shuffle volume is independent of corpus size. Empty cells keep
    * their previous centroid (standard rule, as in [[Clustering]]).
    */
  def lloydStepAll(df: DataFrame, vecCol: String, cb: Codebooks): Codebooks = {
    val withCodes = df.select(col(vecCol),
      pq_encode(col(vecCol), cb.cents).as("__codes"))
    val perSub = transform(sequence(lit(0), lit(cb.m - 1)), s => struct(
      s.as("s"),
      element_at(col("__codes"), s + lit(1)).as("code"),
      subVec(col(vecCol), s, cb.dsub).as("sub")))
    val sums = withCodes.select(explode(perSub).as("e"))
      .select(col("e.s").as("s"), col("e.code").as("code"),
        posexplode(col("e.sub")).as(Seq("dim", "x")))
      .groupBy("s", "code", "dim")
      .agg(sum(floor(col("x").cast("double") * Clustering.Grid).cast("long")).as("sm"),
        count(lit(1)).as("n"))
      .collect() // ≤ m·ksub·dsub = dim·ksub rows — bounded by construction
    val next = cb.cents.map(_.map(_.clone()))
    sums.groupBy(r => (r.getInt(0), r.getInt(1))).foreach { case ((s, code), rows) =>
      val cv = new Array[Double](cb.dsub)
      rows.foreach { r =>
        cv(r.getInt(2)) = r.getLong(3).toDouble / (r.getLong(4).toDouble * Clustering.Grid)
      }
      next(s)(code) = cv
    }
    cb.copy(cents = next)
  }

  /** Train all sub-quantizers: `iters` fused Lloyd iterations. */
  def train(df: DataFrame, vecCol: String, idCol: String,
            m: Int = 8, ksub: Int = 16, iters: Int = 3): Codebooks = {
    var cb = seedCodebooks(df, vecCol, idCol, m, ksub)
    var i = 0
    while (i < iters) { cb = lloydStepAll(df, vecCol, cb); i += 1 }
    cb
  }

  /** Map-only corpus encoding: (id, codes array<int> of length m). At
    * real scale this is written once (bucketed parquet) and every ANN
    * query reads codes, never raw vectors.
    */
  def encode(df: DataFrame, vecCol: String, idCol: String, cb: Codebooks): DataFrame =
    df.select(col(idCol), pq_encode(col(vecCol), cb.cents).as("codes"))

  /** Per-query ADC lookup tables as a (query_id, lut) DataFrame:
    * `lut(s·ksub + j) = dot(q_sub_s, cents(s)(j))`, built driver-side
    * (queries are bounded by construction — the broadcast side of every
    * graft ANN path). Shared by [[topK]], [[ivfAdcTopK]] and the
    * persisted [[AnnIndex.queryIvfAdc]], so the three score the exact
    * same doubles.
    */
  private[operators] def adcLuts(queries: DataFrame, vecCol: String,
                                 idCol: String, cb: Codebooks): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    queries.select(col(idCol), col(vecCol)).collect().map { r =>
      val q = r.getSeq[Float](1).map(_.toDouble).toArray
      val lut = new Array[Double](cb.m * cb.ksub)
      for (s <- 0 until cb.m; j <- 0 until cb.ksub) {
        var d = 0.0
        var t = 0
        while (t < cb.dsub) { d += q(s * cb.dsub + t) * cb.cents(s)(j)(t); t += 1 }
        lut(s * cb.ksub + j) = d
      }
      (r.getLong(0), lut.toSeq)
    }.toSeq.toDF("query_id", "lut")
  }

  /** ADC top-k over an encoded corpus. `queries` must be bounded by
    * construction (the broadcast side): their lookup tables enter the
    * plan through a broadcast join; scoring a corpus row is `m` array
    * lookups summed in fixed order.
    */
  def topK(encoded: DataFrame, queries: DataFrame, vecCol: String,
           idCol: String, k: Int, cb: Codebooks): DataFrame = {
    val q = broadcast(adcLuts(queries, vecCol, idCol, cb))
    val scored = encoded.select(col(idCol).as("neighbor_id"), col("codes"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("score", adc_score(col("codes"), col("lut"), cb.ksub))
      .select(col("query_id"), col("neighbor_id"), col("score"))
    val top = graft.plans.TopK.perKey(scored, Seq(col("query_id")),
      Seq(col("score").desc, col("neighbor_id").asc), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), 6).as("score"))
  }

  /** Exact re-rank of an ADC shortlist (the standard ADC+refine step):
    * raw vectors are fetched for shortlist candidates ONLY — a
    * candidates-sized hash join against the corpus, never a second full
    * scan through float math — and true cosine re-ranks them to k.
    */
  def refine(shortlisted: DataFrame, corpus: DataFrame, queries: DataFrame,
             vecCol: String, idCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = shortlisted.select("query_id", "neighbor_id")
      .join(q, Seq("query_id")).join(c, Seq("neighbor_id"))
      .withColumn("score", graft.functions.cosine_similarity(col("q_vec"), col("c_vec")))
      .select(col("query_id"), col("neighbor_id"), col("score"))
    val top = graft.plans.TopK.perKey(scored, Seq(col("query_id")),
      Seq(col("score").desc, col("neighbor_id").asc), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), 6).as("score"))
  }

  /** IVFADC — the full production ANN composition: IVF coarse cells
    * bound WHICH rows are scored, PQ codes bound what scoring COSTS.
    * The corpus is assigned to `nlist` cells (map-only, literal pivots)
    * and encoded once; a query probes its `nprobe` nearest cells and
    * ADC-scores only the codes in those cells — and because cell_id is
    * an EQUI-join key, the probe is a broadcast hash join (the flat-ADC
    * path must stream every code row past every query). At real scale
    * the encoded table is written bucketed by cell_id and a probe reads
    * ~nprobe/nlist of it. Optional exact-cosine refine of the shortlist.
    */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
                 idCol: String, k: Int, nlist: Int, nprobe: Int = 2,
                 m: Int = 8, ksub: Int = 16, iters: Int = 3,
                 shortlist: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    val pivots = Similarity.ivfPivots(corpus, vecCol, idCol, nlist)
    val assigned = Similarity.ivfAssign(corpus, vecCol, idCol, spark, nlist)
    val cb = train(corpus, vecCol, idCol, m, ksub, iters)
    val encoded = assigned.select(col(idCol).as("neighbor_id"), col("cell_id"),
      pq_encode(col(vecCol), cb.cents).as("codes"))
    val probes = Similarity.ivfProbeCells(queries, pivots, vecCol, idCol, nprobe)
      .select(col("query_id"), col("cell_id"))
      .join(adcLuts(queries, vecCol, idCol, cb), Seq("query_id"))
    val scored = encoded.join(broadcast(probes), Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", adc_score(col("codes"), col("lut"), cb.ksub))
      .select(col("query_id"), col("neighbor_id"), col("score"))
    val sl = math.max(k, shortlist)
    val top = graft.plans.TopK.perKey(scored, Seq(col("query_id")),
      Seq(col("score").desc, col("neighbor_id").asc), sl)
    if (shortlist > k) refine(top, corpus, queries, vecCol, idCol, k)
    else {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("neighbor_id"))
      top.withColumn("rank", row_number().over(w).cast("long"))
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("score"), 6).as("score"))
    }
  }

  /** Train + encode + score in one call (the query-surface entry).
    * `shortlist > k` turns on ADC+refine: the lookup-table pass narrows
    * the corpus to `shortlist` candidates per query, then exact cosine
    * re-ranks those candidates to k — the production PQ shape (codes
    * bound the scan; floats are touched only for the shortlist).
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
             idCol: String, k: Int, m: Int = 8, ksub: Int = 16,
             iters: Int = 3, shortlist: Int = 0): DataFrame = {
    val cb = train(corpus, vecCol, idCol, m, ksub, iters)
    val enc = encode(corpus, vecCol, idCol, cb)
    if (shortlist > k) {
      val cand = topK(enc, queries, vecCol, idCol, shortlist, cb)
      refine(cand, corpus, queries, vecCol, idCol, k)
    } else topK(enc, queries, vecCol, idCol, k, cb)
  }
}
