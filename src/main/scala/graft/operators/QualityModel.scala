package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame}

/** Trained quality filtering: a logistic-regression scorer learned
  * DISTRIBUTIVELY by IRLS (Newton's method) — the fasttext-style "train a
  * cheap linear model, score the whole corpus map-only" pattern (here
  * distilling the rule-based `TextAnalysis.quality` heuristic into a
  * linear model, the usual way a hand-tuned filter is converted into a
  * calibrated score).
  *
  * Distributed shape, per iteration: the current weights enter the
  * plan as LITERALS (broadcast-by-plan), per-row gradient/Hessian terms
  * are codegen'd expressions, and their SUMS are one partial+final
  * HashAggregate — the only thing crossing the wire is O(d²) numbers per
  * task; the driver solves the bounded (d+1)-dim Newton system. The
  * feature matrix is computed once and cached; plan depth is constant
  * across iterations (weights are literals, not lineage).
  *
  * Determinism: gradient/Hessian sums are funneled through DECIMAL(38,18)
  * before summing, so training — and therefore the model — is
  * bit-identical under ANY partitioning (the repo-wide decimal-funnel
  * rule; QualityModelSpec asserts exact weight equality under
  * repartitioning).
  */
object QualityModel {

  /** Standardized feature matrix + distilled binary label over documents:
    * features from the rule-based quality pass, label = the heuristic's
    * own accept/reject decision (quality_score above `threshold`).
    */
  def featureTable(df: DataFrame, textCol: String, idCol: String,
                   threshold: Double = 0.45): DataFrame = {
    val q = TextAnalysis.quality(df, textCol, idCol)
      .select(col(idCol), col("unique_ratio"), col("stopword_ratio"),
        col("mean_token_len"), (col("n_tokens").cast("double") / 100.0).as("len_scaled"),
        (col("quality_score") > threshold).cast("double").as("label"))
    // standardize: (x - mean) / std, moments decimal-funneled so every
    // partitioning sees the identical scaler
    val feats = Seq("unique_ratio", "stopword_ratio", "mean_token_len", "len_scaled")
    val stats = q.select(feats.flatMap(f => Seq(
      sum(col(f).cast(DecimalType(38, 18))).cast("double").as(s"s_$f"),
      sum((col(f) * col(f)).cast(DecimalType(38, 18))).cast("double").as(s"ss_$f"))) :+
      count(lit(1)).cast("double").as("n"): _*).head()
    val n = stats.getAs[Double]("n")
    feats.zipWithIndex.foldLeft(q) { case (acc, (f, i)) =>
      val mean = stats.getAs[Double](s"s_$f") / n
      val variance = math.max(stats.getAs[Double](s"ss_$f") / n - mean * mean, 1e-12)
      acc.withColumn(f, (col(f) - lit(mean)) / lit(math.sqrt(variance)))
    }
  }

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Distributed IRLS (Newton's method): each iteration is ONE
    * partial+final aggregate computing the gradient `X'(y − p)` AND the
    * Hessian `X'RX` (R = diag(p(1−p))) together — (d+1)(d+4)/2 decimal
    * sums cross the wire per task — and the driver solves the bounded
    * (d+1)×(d+1) system. Quadratic convergence: ~5 iterations where
    * first-order GD needs dozens of jobs. `ridge` regularizes the solve
    * against separation-degenerate Hessians (declared semantics).
    */
  def train(features: DataFrame, featureCols: Seq[String], labelCol: String,
            iters: Int = 5, ridge: Double = 1e-6): Array[Double] = {
    val cached = features.persist()
    val d = featureCols.length + 1 // + bias
    var w = Array.fill(d)(0.0)
    for (_ <- 0 until iters) {
      val margin = featureCols.zipWithIndex
        .map { case (f, i) => col(f) * lit(w(i)) }
        .reduce(_ + _) + lit(w.last)
      val p = sigmoid(margin) // codegen'd
      val r = p * (lit(1.0) - p)
      val x: Int => Column = i => if (i == d - 1) lit(1.0) else col(featureCols(i))
      val gCols = (0 until d).map(i =>
        sum(((col(labelCol) - p) * x(i)).cast(DecimalType(38, 18))).cast("double"))
      val hCols = for (i <- 0 until d; j <- i until d) yield
        sum((r * x(i) * x(j)).cast(DecimalType(38, 18))).cast("double")
      val row = cached.select(gCols ++ hCols: _*).head()
      val g = Array.tabulate(d)(row.getDouble)
      val h = Array.ofDim[Double](d, d)
      var idx = d
      for (i <- 0 until d; j <- i until d) {
        h(i)(j) = row.getDouble(idx); h(j)(i) = h(i)(j); idx += 1
      }
      (0 until d).foreach(i => h(i)(i) += ridge)
      w = w.zip(solve(h, g)).map { case (a, b) => a + b }
    }
    cached.unpersist()
    w
  }

  /** Gaussian elimination with partial pivoting on the bounded Newton
    * system — deterministic for identical inputs, which the
    * decimal-funneled sums guarantee under any partitioning.
    */
  private def solve(h0: Array[Array[Double]], g0: Array[Double]): Array[Double] = {
    val n = g0.length
    val a = h0.map(_.clone())
    val b = g0.clone()
    for (c <- 0 until n) {
      val piv = (c until n).maxBy(r => math.abs(a(r)(c)))
      val (ta, tb) = (a(c), b(c)); a(c) = a(piv); a(piv) = ta; b(c) = b(piv); b(piv) = tb
      for (r <- c + 1 until n) {
        val f = a(r)(c) / a(c)(c)
        for (k <- c until n) a(r)(k) -= f * a(c)(k)
        b(r) -= f * b(c)
      }
    }
    val xs = new Array[Double](n)
    for (r <- n - 1 to 0 by -1) {
      var s = b(r)
      for (k <- r + 1 until n) s -= a(r)(k) * xs(k)
      xs(r) = s / a(r)(r)
    }
    xs
  }

  /** Map-only corpus scoring under a trained model. */
  def score(features: DataFrame, featureCols: Seq[String],
            weights: Array[Double]): DataFrame = {
    val margin = featureCols.zipWithIndex
      .map { case (f, i) => col(f) * lit(weights(i)) }
      .reduce(_ + _) + lit(weights.last)
    features.withColumn("score", sigmoid(margin))
      .withColumn("predicted", (col("score") >= 0.5).cast("int"))
  }

  val defaultFeatures: Seq[String] =
    Seq("unique_ratio", "stopword_ratio", "mean_token_len", "len_scaled")
}
