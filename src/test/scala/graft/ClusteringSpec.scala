package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** k-means + semantic dedup semantics: separable clusters are recovered,
  * the integer-grid arithmetic is partition-invariant, empty cells keep
  * their centroids, and the dominated-by-smaller-id dedup rule matches a
  * brute-force model.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // two tight, well-separated 4-d clusters around (1,0,0,0) and (0,1,0,0)
  private def planted(n: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      val base = if (i % 2 == 0) Array(1f, 0f, 0f, 0f) else Array(0f, 1f, 0f, 0f)
      val jit = 0.01f * ((i % 7) - 3)
      (i.toLong, base.map(_ + jit).toSeq)
    }

  test("kmeans recovers separable clusters and assigns every vector") {
    val df = planted(40).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val cents = Clustering.kmeans(df, "embedding", "vec_id", k = 2, iters = 3)
    val cells = Clustering.assign(df, "embedding", "vec_id", cents)
      .select("vec_id", "cell_id").as[(Long, Int)].collect().toMap
    assert(cells.size == 40)
    // all even ids in one cell, all odd in the other
    val evenCells = cells.filter(_._1 % 2 == 0).values.toSet
    val oddCells = cells.filter(_._1 % 2 == 1).values.toSet
    assert(evenCells.size == 1 && oddCells.size == 1 && evenCells != oddCells)
  }

  test("lloydStep is invariant under repartitioning (integer-grid sums)") {
    val base = planted(30).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val seeds = Clustering.seedCentroids(base, "embedding", "vec_id", 2)
    val c1 = Clustering.lloydStep(base.repartition(1), "embedding", "vec_id", seeds)
    val c32 = Clustering.lloydStep(base.repartition(32), "embedding", "vec_id", seeds)
    assert(c1.map(_.toSeq).toSeq == c32.map(_.toSeq).toSeq) // bit-equal, not approx
  }

  test("a cell that loses all members keeps its previous centroid") {
    // both vectors sit on top of seed candidate 0's position: after one
    // step every vector assigns to one cell and the other keeps its seed
    val df = Seq((0L, Seq(1f, 0f)), (1L, Seq(0.99f, 0.01f))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val seeds = Clustering.seedCentroids(df, "embedding", "vec_id", 2)
    val next = Clustering.lloydStep(df, "embedding", "vec_id", seeds)
    val counts = Clustering.assign(df, "embedding", "vec_id", seeds)
      .groupBy("cell_id").count().as[(Int, Long)].collect().toMap
    val empty = (0 to 1).filterNot(counts.contains)
    empty.foreach(c => assert(next(c).toSeq == seeds(c).toSeq))
  }

  test("semanticDedup matches the brute-force dominated-by-smaller-id model") {
    val df = planted(24).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val t = 0.999
    val got = Clustering.semanticDedup(df, "embedding", "vec_id", k = 2,
        iters = 2, threshold = t)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap

    // model: same-cell lower-id mate with cosine >= t  =>  dropped
    val cents = Clustering.kmeans(df, "embedding", "vec_id", k = 2, iters = 2)
    val cell = Clustering.assign(df, "embedding", "vec_id", cents)
      .select("vec_id", "cell_id").as[(Long, Int)].collect().toMap
    val vecs = planted(24).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val want = vecs.keys.map { id =>
      id -> !vecs.keys.exists(o =>
        o < id && cell(o) == cell(id) && cos(vecs(o), vecs(id)) >= t)
    }.toMap
    assert(got == want)
    assert(got.values.exists(!_)) // the planted clusters do contain near-dups
  }

  test("prototypes: per-cell top-n by cosine to own centroid, brute-force checked") {
    val df = planted(40).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val n = 3
    val out = Clustering.prototypes(df, "embedding", "vec_id", k = 2,
        iters = 3, n = n)
      .as[(Long, Int, Long, Double)].collect()
    val byCell = out.groupBy(_._2)
    assert(byCell.size == 2)
    byCell.foreach { case (_, rows) =>
      assert(rows.length == n)
      assert(rows.sortBy(_._3).map(_._4).toSeq.sliding(2)
        .forall(p => p.head >= p.last), rows.toSeq) // rank order = cos desc
    }
    // brute-force: each cell's rank-1 prototype has the max cosine to its
    // centroid among the cell's members
    val cents = Clustering.kmeans(df, "embedding", "vec_id", k = 2, iters = 3)
    val assigned = Clustering.assign(df, "embedding", "vec_id", cents)
      .select("vec_id", "cell_id").as[(Long, Int)].collect()
    val vecs = df.as[(Long, Seq[Float])].collect().toMap
    def cos(v: Seq[Float], c: Array[Double]): Double = {
      val d = v.indices.map(i => v(i).toDouble * c(i)).sum
      d / (math.sqrt(v.map(x => x.toDouble * x).sum) * math.sqrt(c.map(x => x * x).sum))
    }
    byCell.foreach { case (cell, rows) =>
      val top = rows.minBy(_._3)
      val best = assigned.filter(_._2 == cell)
        .map { case (id, _) => id -> cos(vecs(id), cents(cell)) }
        .maxBy { case (id, c) => (c, -id) }
      assert(top._1 == best._1, s"cell $cell: ${top._1} vs ${best._1}")
    }
    // partition-invariant
    val again = Clustering.prototypes(df.repartition(13), "embedding", "vec_id",
        k = 2, iters = 3, n = n)
      .as[(Long, Int, Long, Double)].collect()
    assert(out.toSet == again.toSet)
  }

  test("semanticDedup keeps every vector of an over-cap cell (skew guard)") {
    val df = planted(20).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val r = Clustering.semanticDedup(df, "embedding", "vec_id", k = 2,
        iters = 1, threshold = 0.5, maxCluster = 3) // every cell over cap
      .select("vec_id", "kept").as[(Long, Boolean)].collect()
    assert(r.length == 20 && r.forall(_._2)) // under-delete, never over-delete
  }
}
