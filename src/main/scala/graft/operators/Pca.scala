package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** PCA over an embedding column, by power iteration on the covariance
  * matrix — the embedding-space diagnostic a training pipeline runs
  * before trusting vectors at scale (dominant-direction drift, collapsed
  * dimensions, whitening input). Public algorithm: power iteration with
  * Hotelling deflation is textbook numerical linear algebra (Golub & Van
  * Loan); no library dependency.
  *
  * Everything is RELATIONAL — no driver-side linear algebra at all:
  *   - `flat`: posexplode to (id, i, x) — N·d rows, one scan.
  *   - means: d grouped fixed-point sums.
  *   - covariance: by default ONE [[graft.functions.GramianAgg]] pass
  *     (d²/2 primitive adds per row into a 128-bit fixed-point buffer;
  *     the exchange is one model-sized buffer per partition); the
  *     equivalent relational self-join of `flat` on id remains as the
  *     SQL-oracle anchor (`gramian = false`) and is pinned bit-equal in
  *     PcaSpec. C = Σxy/n − mᵢmⱼ either way.
  *   - power iteration: `iters` rounds of (cov ⋈ v → grouped sum →
  *     normalize), each on the d²-row matrix — model-sized jobs, eagerly
  *     localCheckpoint'ed so the loop doesn't deepen the plan.
  *   - deflation (second component): λ₁ = v₁ᵀCv₁ via one more mat-vec +
  *     fixed-point dot; C₂ = C − λ₁·v₁v₁ᵀ materialized as one model-sized
  *     join; iterate again on C₂.
  *   - projection: flat ⋈ means ⋈ v, one grouped exact-integer sum per
  *     row (quantized BIGINT terms — order-free without decimals).
  *
  * Determinism: cross-row sums go through the fixed-point qsum grid; the
  * per-element ops (double ·, −, /, sqrt) are IEEE-754 correctly rounded
  * in every engine; v₀ = 1/√d is a fixed literal. The oracle replays the
  * identical relational algorithm in SQL, so the trained components — not
  * just the scoring — are hash-checked. Power-iteration caveat (inherent,
  * not an implementation gap): if an eigenvalue is degenerate or v₀ is
  * orthogonal to the target eigenvector, the iteration converges slowly
  * or to another component — with real data and a dense v₀ this does not
  * occur, and determinism holds regardless (both engines walk the same
  * trajectory).
  */
object Pca {

  private val Quantum = 1.0e12
  private val Clamp = 1.0e6

  private def qsum(term: Column) =
    sum(floor(least(greatest(term, lit(-Clamp)), lit(Clamp)) * lit(Quantum))
      .cast(DecimalType(38, 0))).cast("double") / lit(Quantum)

  /** flat (id, i, x), means (i, m), cov (i, j, c) — all checkpointed.
    *
    * Two covariance paths with bit-identical output (PcaSpec pins it):
    *
    *  - `gramian = true` (default — the compute path): ONE
    *    [[graft.functions.GramianAgg]] pass accumulates the d·(d+1)/2
    *    upper-triangle fixed-point sums in a flat 128-bit buffer per
    *    partition; the full matrix is the triangle unioned with its
    *    mirror (xᵢxⱼ = xⱼxᵢ exactly in IEEE). Per row: d²/2 primitive
    *    adds, no join machinery.
    *  - `gramian = false` (the SQL-oracle anchor): the relational
    *    self-join of `flat` on id emits d² product rows per input row;
    *    map-side partial aggregation collapses them to ≤ d² per
    *    partition before the (i,j) exchange. Correct shuffle shape, but
    *    the d²-per-row materialization is the wrong CONSTANT at
    *    production widths — ~10⁶ InternalRows per vector at d = 1024.
    */
  private def covariance(df0: DataFrame, vecCol: String, idCol: String,
                         nD: Column, dim: Int,
                         gramian: Boolean): (DataFrame, DataFrame, DataFrame) = {
    // both covariance paths must agree on MALFORMED input too: GramianAgg
    // requires length == dim, so the relational path gets the same guard
    // here — a ragged vector fails the job loudly on either path instead
    // of one path silently computing over partial products
    val df = df0.select(col(idCol),
      when(size(col(vecCol)) === dim, col(vecCol))
        .otherwise(raise_error(concat(
          lit("pca: vector length "), size(col(vecCol)).cast("string"),
          lit(s" != dim $dim")))).as(vecCol))
    val flat = df
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("i0", "xf")))
      .select(col(idCol), (col("i0") + 1).cast("long").as("i"),
        col("xf").cast("double").as("x"))
      .localCheckpoint(true)
    val means = flat.groupBy("i").agg((qsum(col("x")) / nD).as("m"))
      .localCheckpoint(true)
    val sxx =
      if (gramian) {
        val tri = df
          .select(graft.functions.GramianAgg.gramian_upper(
            col(vecCol).cast("array<double>"), dim, Quantum, Clamp).as("g"))
          .select(explode(col("g")).as("e"))
          .select(col("e.i").as("i"), col("e.j").as("j"), col("e.sxx").as("sxx"))
        tri.union(tri.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("sxx")))
      } else {
        val flatB = flat.select(col(idCol), col("i").as("j"), col("x").as("y"))
        flat.join(flatB, idCol)
          .groupBy("i", "j")
          .agg(qsum(col("x") * col("y")).as("sxx"))
      }
    // no explicit repartition of the d²-row matrix: AQE already coalesces
    // the model-sized exchanges (measured — an explicit repartition(1)
    // before the checkpoint ADDED a stage and cost ~20% on emb_pca2)
    val cov = sxx
      .join(means.select(col("i"), col("m").as("mi")), "i")
      .join(means.select(col("i").as("j"), col("m").as("mj")), "j")
      .select(col("i"), col("j"), (col("sxx") / nD - col("mi") * col("mj")).as("c"))
      .localCheckpoint(true)
    (flat, means, cov)
  }

  /** `iters` normalized power-iteration rounds from v₀ = 1/√d. */
  private def iterate(spark: SparkSession, cov: DataFrame, dim: Int,
                      iters: Int): DataFrame = {
    var v = spark.range(1, dim + 1)
      .select(col("id").as("i"), lit(1.0 / math.sqrt(dim.toDouble)).as("v"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val u = matVec(cov, v)
      val norm = u.agg(sqrt(qsum(col("u") * col("u"))).as("nrm"))
      v = u.crossJoin(norm)
        .select(col("i"), (col("u") / col("nrm")).as("v"))
        .localCheckpoint(true)
    }
    v
  }

  private def matVec(cov: DataFrame, v: DataFrame): DataFrame =
    cov.join(v.select(col("i").as("j"), col("v")), "j")
      .groupBy("i").agg(qsum(col("c") * col("v")).as("u"))

  /** Quantized-BIGINT per-row projection term for component column `w`.
    * Terms clamp to ±1e6 like qsum's (a term past the clamp would
    * silently overflow the long at ×1e12); the long sum then has ~9e6
    * rows of headroom per GROUP even at the clamp — and a projection
    * group is one vector's d terms, bounded by construction.
    */
  private def projTerm(w: Column): Column =
    sum(floor(least(greatest((col("x") - col("m")) * w, lit(-Clamp)), lit(Clamp))
      * lit(Quantum)).cast("long"))
      .cast("double") / lit(Quantum)

  /** (idCol, pc1): each row's projection onto the power-iterated top
    * principal component of the centered covariance. `dim` must equal
    * the embedding length. `gramian` picks the covariance path — see
    * [[covariance]]; results are bit-identical either way.
    */
  def powerIterationPc1(df: DataFrame, vecCol: String, idCol: String,
                        dim: Int, iters: Int = 6,
                        gramian: Boolean = true): DataFrame = {
    require(dim >= 1 && iters >= 1, "pca needs dim >= 1 and iters >= 1")
    val spark = df.sparkSession
    val nD = lit(df.count().toDouble)
    val (flat, means, cov) = covariance(df, vecCol, idCol, nD, dim, gramian)
    val v = iterate(spark, cov, dim, iters)
    flat.join(means, "i").join(v, "i")
      .groupBy(col(idCol))
      .agg(projTerm(col("v")).as("pc1"))
  }

  /** (idCol, pc1, pc2): top two components via Hotelling deflation —
    * C₂ = C − λ₁·v₁v₁ᵀ with λ₁ = v₁ᵀCv₁, then the same iteration on C₂.
    * Both projections come out of ONE grouped pass over `flat`.
    */
  def powerIterationTop2(df: DataFrame, vecCol: String, idCol: String,
                         dim: Int, iters: Int = 6,
                         gramian: Boolean = true): DataFrame = {
    require(dim >= 2 && iters >= 1, "top2 needs dim >= 2 and iters >= 1")
    val spark = df.sparkSession
    val nD = lit(df.count().toDouble)
    val (flat, means, cov) = covariance(df, vecCol, idCol, nD, dim, gramian)
    val v1 = iterate(spark, cov, dim, iters)
    // Rayleigh quotient of the normalized v1 (|v1| = 1 by construction)
    val lam = matVec(cov, v1)
      .join(v1, "i")
      .agg(qsum(col("v") * col("u")).as("l"))
    val cov2 = cov
      .join(v1.select(col("i"), col("v").as("vi")), "i")
      .join(v1.select(col("i").as("j"), col("v").as("vj")), "j")
      .crossJoin(lam)
      .select(col("i"), col("j"),
        (col("c") - ((col("l") * col("vi")) * col("vj"))).as("c"))
      .localCheckpoint(true)
    val v2 = iterate(spark, cov2, dim, iters)
    flat.join(means, "i")
      .join(v1.select(col("i"), col("v").as("w1")), "i")
      .join(v2.select(col("i"), col("v").as("w2")), "i")
      .groupBy(col(idCol))
      .agg(projTerm(col("w1")).as("pc1"), projTerm(col("w2")).as("pc2"))
  }
}
