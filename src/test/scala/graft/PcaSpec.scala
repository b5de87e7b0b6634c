package graft

import graft.operators.Pca

/** Power-iteration PCA: analytic small case (collinear 2-D points have a
  * known top component and exact projections) and bit-invariance across
  * partitionings.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("collinear 2-D points project to t*|a| along the line direction") {
    // points t*(1,2), t = -2..2: covariance is rank-1 with eigenvector
    // (1,2)/sqrt(5); the centered projection of point t is t*sqrt(5)
    val pts = (-2 to 2).map(t => (t.toLong + 2L, Array(t.toFloat, 2f * t)))
      .toDF("vec_id", "embedding")
    val out = Pca.powerIterationPc1(pts, "embedding", "vec_id", dim = 2, iters = 4)
      .orderBy("vec_id").as[(Long, Double)].collect().toSeq
    val s5 = math.sqrt(5.0)
    (-2 to 2).zip(out).foreach { case (t, (_, pc1)) =>
      // fixed-point grid quantizes at 1e-12 per term; stay well above it
      assert(math.abs(pc1 - t * s5) < 1e-6, s"t=$t pc1=$pc1")
    }
  }

  test("bit-identical across partitionings") {
    val pts = (1 to 100).map(i =>
      (i.toLong, Array.tabulate(8)(j => ((i * (j + 3)) % 17 - 8).toFloat)))
      .toDF("vec_id", "embedding")
    val r1 = Pca.powerIterationPc1(pts.repartition(1), "embedding", "vec_id",
      dim = 8, iters = 5).orderBy("vec_id").as[(Long, Double)].collect().toSeq
    val r32 = Pca.powerIterationPc1(pts.repartition(32), "embedding", "vec_id",
      dim = 8, iters = 5).orderBy("vec_id").as[(Long, Double)].collect().toSeq
    assert(r1 == r32)
  }
}
