package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame}

/** Trained quality filtering: a logistic-regression scorer learned
  * DISTRIBUTIVELY by batch gradient descent — the fasttext-style "train a
  * cheap linear model, score the whole corpus map-only" pattern (here
  * distilling the rule-based `TextAnalysis.quality` heuristic into a
  * linear model, the usual way a hand-tuned filter is converted into a
  * calibrated score).
  *
  * Distributed shape, per GD iteration: the current weights enter the
  * plan as LITERALS (broadcast-by-plan), the per-row gradient is a
  * codegen'd expression, and the gradient SUM is one partial+final
  * HashAggregate — the only thing crossing the wire is d+1 numbers per
  * task. The feature matrix is computed once and cached; plan depth is
  * constant across iterations (weights are literals, not lineage).
  *
  * Determinism: gradient components are funneled through DECIMAL(38,18)
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

  /** Batch gradient descent; returns (weights..., bias). One aggregate
    * job per iteration over the cached feature table.
    */
  def train(features: DataFrame, featureCols: Seq[String], labelCol: String,
            iters: Int = 25, lr: Double = 1.0): Array[Double] = {
    val cached = features.persist()
    val n = cached.count().toDouble
    var w = Array.fill(featureCols.length + 1)(0.0) // last = bias
    for (_ <- 0 until iters) {
      val margin = featureCols.zipWithIndex
        .map { case (f, i) => col(f) * lit(w(i)) }
        .reduce(_ + _) + lit(w.last)
      val err = sigmoid(margin) - col(labelCol) // codegen'd residual
      val grads = cached.select(
        featureCols.map(f => sum((err * col(f)).cast(DecimalType(38, 18)))
          .cast("double")) :+
        sum(err.cast(DecimalType(38, 18))).cast("double"): _*).head()
      w = w.indices.map(i => w(i) - lr * grads.getDouble(i) / n).toArray
    }
    cached.unpersist()
    w
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
