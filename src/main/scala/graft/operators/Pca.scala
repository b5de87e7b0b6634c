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
  *   - covariance: the co-partitioned self-join of `flat` on id emits the
  *     d² products per row which partial aggregation collapses to ≤ d²
  *     rows per partition before the (i,j) shuffle — the exchange is
  *     model-sized (d² rows), never corpus-sized. C = Σxy/n − mᵢmⱼ.
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

  /** flat (id, i, x), means (i, m), cov (i, j, c) — all checkpointed. */
  private def covariance(df: DataFrame, vecCol: String, idCol: String,
                         nD: Column): (DataFrame, DataFrame, DataFrame) = {
    val flat = df
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("i0", "xf")))
      .select(col(idCol), (col("i0") + 1).cast("long").as("i"),
        col("xf").cast("double").as("x"))
      .localCheckpoint(true)
    val means = flat.groupBy("i").agg((qsum(col("x")) / nD).as("m"))
      .localCheckpoint(true)
    val flatB = flat.select(col(idCol), col("i").as("j"), col("x").as("y"))
    val cov = flat.join(flatB, idCol)
      .groupBy("i", "j")
      .agg(qsum(col("x") * col("y")).as("sxx"))
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

  /** Quantized-BIGINT per-row projection term for component column `w`. */
  private def projTerm(w: Column): Column =
    sum(floor(((col("x") - col("m")) * w) * lit(Quantum)).cast("long"))
      .cast("double") / lit(Quantum)

  /** (idCol, pc1): each row's projection onto the power-iterated top
    * principal component of the centered covariance. `dim` must equal
    * the embedding length.
    */
  def powerIterationPc1(df: DataFrame, vecCol: String, idCol: String,
                        dim: Int, iters: Int = 6): DataFrame = {
    require(dim >= 1 && iters >= 1, "pca needs dim >= 1 and iters >= 1")
    val spark = df.sparkSession
    val nD = lit(df.count().toDouble)
    val (flat, means, cov) = covariance(df, vecCol, idCol, nD)
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
                         dim: Int, iters: Int = 6): DataFrame = {
    require(dim >= 2 && iters >= 1, "top2 needs dim >= 2 and iters >= 1")
    val spark = df.sparkSession
    val nD = lit(df.count().toDouble)
    val (flat, means, cov) = covariance(df, vecCol, idCol, nD)
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
