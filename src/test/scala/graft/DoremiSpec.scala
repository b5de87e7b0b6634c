package graft

import graft.operators.Doremi
import org.apache.spark.sql.functions._

/** DoReMi domain reweighting: closed-form MW rounds on the 1e-12 grid. */
class DoremiSpec extends SparkSpec {
  import spark.implicits._

  test("domainWeights: one closed-form MW round, smooth=0") {
    // two domains, excess (1.0, 0.0): alpha0 = 5e11 each;
    // u = (1e12, 5e11), s = 1.5e12 ->
    // alpha = (floor(2/3*1e12), floor(1/3*1e12)) = (666666666666, 333333333333)
    val df = Seq(("a", 2.0, 1.0), ("a", 3.0, 2.0), ("b", 1.0, 1.0), ("b", 0.5, 1.0))
      .toDF("dom", "proxy", "ref")
    val r = Doremi.domainWeights(df, "dom", col("proxy"), col("ref"),
        eta = 1.0, smooth = 0.0, rounds = 1)
      .orderBy("domain")
      .select("domain", "n_docs", "excess", "weight")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(r == Seq(
      ("a", 2L, 1.0, 0.666666666666),
      ("b", 2L, 0.0, 0.333333333333)))
  }

  test("domainWeights: headroom domain gains weight monotonically; sum ~ 1") {
    val df = (0 until 300).map { i =>
      val dom = if (i % 3 == 0) "hard" else "easy"
      val excess = if (dom == "hard") 0.8 else 0.1
      (dom, 1.0 + excess, 1.0)
    }.toDF("dom", "proxy", "ref")
    val w = (r: Int) => Doremi.domainWeights(df, "dom", col("proxy"), col("ref"),
        eta = 1.0, smooth = 0.01, rounds = r)
      .select("domain", "weight").as[(String, Double)].collect().toMap
    val (w1, w3) = (w(1), w(3))
    assert(w1("hard") > 0.5 && w3("hard") > w1("hard"), s"$w1 $w3")
    assert(math.abs(w3.values.sum - 1.0) < 1e-9)
  }

  test("domainWeights: negative excess clamps to zero; eta > 8 rejected") {
    val df = Seq(("a", 0.1, 5.0), ("b", 2.0, 1.0)).toDF("dom", "proxy", "ref")
    val r = Doremi.domainWeights(df, "dom", col("proxy"), col("ref"), rounds = 1)
      .orderBy("domain").select("domain", "excess")
      .as[(String, Double)].collect().toSeq
    assert(r == Seq(("a", 0.0), ("b", 1.0)))
    intercept[IllegalArgumentException] {
      Doremi.domainWeights(df, "dom", col("proxy"), col("ref"), eta = 9.0)
    }
  }
}
