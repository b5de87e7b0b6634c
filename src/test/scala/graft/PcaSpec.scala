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

  test("top2: axis-aligned grid recovers both components analytically") {
    // grid (2t, s, 0, 0), t,s in {-1,0,1}: zero means, zero cross-moments
    // -> C = diag(8/3, 2/3, 0, 0) exactly on the quantization grid.
    // pc1 = +e1 (projection 2t), pc2 = +e2 (projection s).
    val pts = (for (t <- -1 to 1; s <- -1 to 1) yield (t, s)).zipWithIndex
      .map { case ((t, s), i) =>
        (i.toLong, Array(2f * t, s.toFloat, 0f, 0f)) }
      .toDF("vec_id", "embedding")
    // eigenvalue ratio is 0.25, so the e2-residual in v1 decays 0.25^t:
    // 14 rounds push it to ~4e-9, inside the 1e-6 assertion
    val out = Pca.powerIterationTop2(pts, "embedding", "vec_id", dim = 4, iters = 14)
      .orderBy("vec_id")
      .as[(Long, Double, Double)].collect().toSeq
    (for (t <- -1 to 1; s <- -1 to 1) yield (t, s)).zip(out)
      .foreach { case ((t, s), (_, pc1, pc2)) =>
        assert(math.abs(pc1 - 2.0 * t) < 1e-6, s"t=$t pc1=$pc1")
        assert(math.abs(pc2 - s) < 1e-6, s"s=$s pc2=$pc2")
      }
  }

  test("gramian-aggregate covariance path equals the relational self-join bit-for-bit") {
    val pts = (1 to 200).map(i =>
      (i.toLong, Array.tabulate(12)(j => (((i * 31 + j * 7) % 23 - 11) / 3.0f))))
      .toDF("vec_id", "embedding")
    val agg = Pca.powerIterationTop2(pts, "embedding", "vec_id",
      dim = 12, iters = 5, gramian = true)
      .orderBy("vec_id").as[(Long, Double, Double)].collect().toSeq
    val join = Pca.powerIterationTop2(pts.repartition(17), "embedding", "vec_id",
      dim = 12, iters = 5, gramian = false)
      .orderBy("vec_id").as[(Long, Double, Double)].collect().toSeq
    assert(agg == join)
  }

  test("ragged vector fails the job loudly on BOTH covariance paths") {
    // the substitutability contract must hold on malformed input too:
    // neither path may silently compute over a wrong-length vector
    val ragged = Seq(
      (1L, Array(1f, 2f, 3f)), (2L, Array(4f, 5f, 6f)), (3L, Array(7f, 8f)))
      .toDF("vec_id", "embedding")
    Seq(true, false).foreach { g =>
      val e = intercept[Exception] {
        Pca.powerIterationPc1(ragged, "embedding", "vec_id", dim = 3,
          iters = 2, gramian = g).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("!= dim")), s"gramian=$g: $e")
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
