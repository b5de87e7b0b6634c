package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.DataFrame

/** PCA (top principal component) over an embedding column, by power
  * iteration on the covariance matrix — the embedding-space diagnostic a
  * training pipeline runs before trusting vectors at scale (dominant-
  * direction drift, collapsed dimensions, whitening input). Public
  * algorithm: power iteration is textbook numerical linear algebra
  * (Golub & Van Loan); no library dependency.
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
  *   - projection: flat ⋈ means ⋈ v, one grouped exact-integer sum per
  *     row (quantized BIGINT terms — order-free without decimals).
  *
  * Determinism: cross-row sums go through the fixed-point qsum grid; the
  * per-element ops (double ·, −, /, sqrt) are IEEE-754 correctly rounded
  * in every engine; v₀ = 1/√d is a fixed literal. The oracle replays the
  * identical relational algorithm in SQL, so the trained component — not
  * just the scoring — is hash-checked. Power-iteration caveat (inherent,
  * not an implementation gap): if the top eigenvalue is degenerate or v₀
  * is orthogonal to the top eigenvector, the iteration converges slowly
  * or to another component — with real data and a dense v₀ this does not
  * occur, and determinism holds regardless (both engines walk the same
  * trajectory).
  */
object Pca {

  private val Quantum = 1.0e12
  private val Clamp = 1.0e6

  private def qsum(term: org.apache.spark.sql.Column) =
    sum(floor(least(greatest(term, lit(-Clamp)), lit(Clamp)) * lit(Quantum))
      .cast(DecimalType(38, 0))).cast("double") / lit(Quantum)

  /** (idCol, pc1): each row's projection onto the power-iterated top
    * principal component of the centered covariance. `dim` must equal
    * the embedding length.
    */
  def powerIterationPc1(df: DataFrame, vecCol: String, idCol: String,
                        dim: Int, iters: Int = 6): DataFrame = {
    require(dim >= 1 && iters >= 1, "pca needs dim >= 1 and iters >= 1")
    val spark = df.sparkSession
    val nD = lit(df.count().toDouble)

    val flat = df
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("i0", "xf")))
      .select(col(idCol), (col("i0") + 1).cast("long").as("i"),
        col("xf").cast("double").as("x"))
      .localCheckpoint(true)

    val means = flat.groupBy("i").agg((qsum(col("x")) / nD).as("m"))
      .localCheckpoint(true)

    val flatB = flat.select(col(idCol), col("i").as("j"), col("x").as("y"))
    val pairs = flat.join(flatB, idCol)
      .groupBy("i", "j")
      .agg(qsum(col("x") * col("y")).as("sxx"))
    val cov = pairs
      .join(means.select(col("i"), col("m").as("mi")), "i")
      .join(means.select(col("i").as("j"), col("m").as("mj")), "j")
      .select(col("i"), col("j"), (col("sxx") / nD - col("mi") * col("mj")).as("c"))
      .localCheckpoint(true)

    var v = spark.range(1, dim + 1)
      .select(col("id").as("i"), lit(1.0 / math.sqrt(dim.toDouble)).as("v"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val u = cov.join(v.select(col("i").as("j"), col("v")), "j")
        .groupBy("i").agg(qsum(col("c") * col("v")).as("u"))
      val norm = u.agg(sqrt(qsum(col("u") * col("u"))).as("nrm"))
      v = u.crossJoin(norm)
        .select(col("i"), (col("u") / col("nrm")).as("v"))
        .localCheckpoint(true)
    }

    // per-row projection: quantized-BIGINT terms, exact long sum
    flat.join(means, "i").join(v, "i")
      .groupBy(col(idCol))
      .agg((sum(floor(((col("x") - col("m")) * col("v")) * lit(Quantum))
        .cast("long")).cast("double") / lit(Quantum)).as("pc1"))
  }
}
