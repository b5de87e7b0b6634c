package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityModel

/** The distributed logistic-regression trainer: distills the rule-based
  * quality heuristic with high accuracy, trains bit-identically under any
  * partitioning (decimal-funneled gradients), and actually descends the
  * loss surface.
  */
class QualityModelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def feats = QualityModel.featureTable(
    Tables.load(spark, sf, "documents"), "text", "doc_id")

  test("distills the rule-based filter: accuracy >= 0.9") {
    val ft = feats.persist()
    val w = QualityModel.train(ft, QualityModel.defaultFeatures, "label")
    val scored = QualityModel.score(ft, QualityModel.defaultFeatures, w)
    val Array(correct, total) = scored.select(
      sum((col("predicted") === col("label").cast("int")).cast("long")),
      count(lit(1))).head().toSeq.map(_.asInstanceOf[Long]).toArray
    ft.unpersist()
    // both classes must be present or the test is vacuous
    assert(scored.select(countDistinct(col("label"))).head().getLong(0) == 2)
    assert(correct.toDouble / total >= 0.9, s"accuracy ${correct.toDouble / total}")
  }

  test("training is bit-deterministic under repartitioning") {
    val a = QualityModel.train(feats.repartition(3), QualityModel.defaultFeatures, "label", iters = 10)
    val b = QualityModel.train(feats.repartition(17), QualityModel.defaultFeatures, "label", iters = 10)
    assert(a.toSeq == b.toSeq)
  }

  test("loss descends: trained model beats the zero model") {
    val ft = feats.persist()
    def logloss(w: Array[Double]): Double =
      QualityModel.score(ft, QualityModel.defaultFeatures, w)
        .select(avg(-(col("label") * log(greatest(col("score"), lit(1e-12)))
          + (lit(1.0) - col("label")) * log(greatest(lit(1.0) - col("score"), lit(1e-12))))))
        .head().getDouble(0)
    val zero = Array.fill(QualityModel.defaultFeatures.length + 1)(0.0)
    val w = QualityModel.train(ft, QualityModel.defaultFeatures, "label", iters = 20)
    val (l0, l1) = (logloss(zero), logloss(w))
    ft.unpersist()
    assert(l1 < l0 * 0.8, s"logloss $l0 -> $l1")
  }
}
