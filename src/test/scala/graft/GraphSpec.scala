package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Event-graph analytics: transition extraction (hand-checked counts and
  * probabilities, tie-break determinism) and PageRank (hand-computed
  * one-iteration values incl. dangling redistribution, mass conservation,
  * partitioning-invariance of the fixed-point sums).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("transitions: per-entity lead sequences, counts and probabilities") {
    // user 1: a b a b ; user 2: a b  -> edges a->b x3, b->a x1
    val ev = Seq(
      (1L, "a", ts(1), 1L), (1L, "b", ts(2), 2L),
      (1L, "a", ts(3), 3L), (1L, "b", ts(4), 4L),
      (2L, "a", ts(5), 5L), (2L, "b", ts(6), 6L)
    ).toDF("u", "t", "ts", "id")
    val out = Graph.transitions(ev, "u", "t", "ts", "id")
      .orderBy("src", "dst").as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", "b", 3L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("transitions: simultaneous timestamps break ties on the tie column") {
    val ev = Seq(
      (1L, "x", ts(1), 10L), (1L, "y", ts(1), 11L), (1L, "z", ts(1), 12L)
    ).toDF("u", "t", "ts", "id")
    val out = Graph.transitions(ev, "u", "t", "ts", "id")
      .orderBy("src").as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(("x", "y", 1L, 1.0), ("y", "z", 1L, 1.0)))
  }

  test("pageRank: one iteration with a dangling node, hand-computed") {
    // a -> b only; b dangles. N=2, r0 = (0.5, 0.5).
    // iter1: inc(b) = 0.5; dangling = rank(b) = 0.5
    //   rank(a) = 0.15/2 + 0.85*(0    + 0.5/2) = 0.2875
    //   rank(b) = 0.15/2 + 0.85*(0.5  + 0.5/2) = 0.7125
    val edges = Seq(("a", "b", 1L)).toDF("src", "dst", "n")
    val r = Graph.pageRank(edges, "src", "dst", "n", iters = 1)
      .orderBy("node").as[(String, Double)].collect().toSeq
    assert(r.map(_._1) == Seq("a", "b"))
    assert(math.abs(r(0)._2 - 0.2875) < 1e-9, r.toString)
    assert(math.abs(r(1)._2 - 0.7125) < 1e-9, r.toString)
  }

  test("pageRank: mass conserved and higher-inlink node ranks higher") {
    // star: b,c,d all -> a ; a -> b. No dangling nodes except c,d? c,d have
    // out-edges; a has out-edge. All nodes emit, mass conserved each round.
    val edges = Seq(("b", "a", 1L), ("c", "a", 1L), ("d", "a", 1L), ("a", "b", 1L))
      .toDF("src", "dst", "n")
    val r = Graph.pageRank(edges, "src", "dst", "n", iters = 5)
      .as[(String, Double)].collect().toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9, r.toString)
    assert(r("a") > r("b") && r("b") > r("c"), r.toString)
    assert(r("c") == r("d"), "symmetric nodes must tie exactly")
  }

  test("pageRank: bit-identical across partitionings (fixed-point sums)") {
    val edges = (1 to 50).map(i => (s"n${i % 7}", s"n${(i * 3) % 7}", (i % 5 + 1).toLong))
      .toDF("src", "dst", "n")
    val r1 = Graph.pageRank(edges.repartition(1), "src", "dst", "n", iters = 3)
      .orderBy("node").as[(String, Double)].collect().toSeq
    val r32 = Graph.pageRank(edges.repartition(32), "src", "dst", "n", iters = 3)
      .orderBy("node").as[(String, Double)].collect().toSeq
    assert(r1 == r32)
  }

  test("pageRank: driver fast path is bit-identical to the forced-distributed loop") {
    // weighted digraph with a dangling node, a hub and parallel-ish edges —
    // exercises incoming folds, dangling redistribution and the grid; the
    // default caps route this through pageRankLocal, localNodeCap = 0
    // forces the distributed loop on the same edges
    val edges = ((1 to 60).map(i => (s"n${i % 9}", s"n${(i * 5 + 2) % 9}", (i % 7 + 1).toLong))
      :+ (("n9", "n0", 3L))) // n9 has no in-edges; n0 a heavy hub
      .toDF("src", "dst", "n")
    val fast = Graph.pageRank(edges, "src", "dst", "n", iters = 4)
      .orderBy("node").as[(String, Double)].collect().toSeq
    val dist = Graph.pageRankCounted(edges, "src", "dst", "n", iters = 4,
        localNodeCap = 0)._1
      .orderBy("node").as[(String, Double)].collect().toSeq
    assert(fast == dist, "local and distributed ranks must be bit-identical")
    // and with the convergence stop engaged on both paths
    val cyc = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "n")
    val (lf, lr) = Graph.pageRankCounted(cyc, "src", "dst", "n", iters = 50, tol = 1e-12)
    val (df0, dr) = Graph.pageRankCounted(cyc, "src", "dst", "n", iters = 50,
      tol = 1e-12, localNodeCap = 0)
    assert(lr == dr, s"convergence round differs: local $lr vs distributed $dr")
    assert(lf.orderBy("node").as[(String, Double)].collect().toSeq ==
      df0.orderBy("node").as[(String, Double)].collect().toSeq)
  }

  test("pageRank: tol stops a converged graph early, same ranks as the full run") {
    // symmetric 2-cycle: the uniform start IS the fixed point — round 1
    // moves nothing, so the L1 check fires immediately
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "n")
    val (early, ran) = Graph.pageRankCounted(edges, "src", "dst", "n",
      iters = 50, tol = 1e-12)
    assert(ran < 50, s"ran $ran of 50 — convergence stop never fired")
    val full = Graph.pageRank(edges, "src", "dst", "n", iters = 50)
      .orderBy("node").as[(String, Double)].collect().toSeq
    assert(early.orderBy("node").as[(String, Double)].collect().toSeq == full)
    // default tol = 0 keeps the fixed-iteration anchor semantics
    val (_, ranFixed) = Graph.pageRankCounted(edges, "src", "dst", "n", iters = 7)
    assert(ranFixed == 7)
  }

  test("connectedComponents: min-node labels per component, isolated " +
    "nodes self-label, direction/duplication ignored") {
    val nodes = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("node")
    // 3->2 reversed + a duplicate edge: both must collapse
    val edges = Seq((1L, 2L), (3L, 2L), (1L, 2L), (5L, 6L)).toDF("x", "y")
    val out = Graph.connectedComponents(nodes, edges, "node")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L), (9L, 9L)))
  }

  test("bfsDistances: hop distances from a source set; unreachable " +
    "absent; direction honored; maxDepth truncates") {
    // directed path 1->2->3->4, plus 4->1 closing a cycle, plus isolated 7
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val src = Seq(1L).toDF("node")
    val out = Graph.bfsDistances(edges, src)
      .orderBy("node").as[(Long, Int)].collect().toSeq
    assert(out == Seq((1L, 0), (2L, 1), (3L, 2), (4L, 3)))
    // direction: nothing reaches 1's predecessors when the cycle edge flips
    val dag = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val from3 = Graph.bfsDistances(dag, Seq(3L).toDF("node"))
      .orderBy("node").as[(Long, Int)].collect().toSeq
    assert(from3 == Seq((3L, 0), (4L, 1)))
    // maxDepth: the frontier stops expanding past the bound
    val shallow = Graph.bfsDistances(dag, Seq(1L).toDF("node"), maxDepth = 1)
      .orderBy("node").as[(Long, Int)].collect().toSeq
    assert(shallow == Seq((1L, 0), (2L, 1)))
  }

  test("triangleCounts: K4 has three triangles per node; a pendant node " +
    "has zero; reversed/duplicate edges collapse") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    // pendant 5 hangs off 1; one K4 edge duplicated reversed
    val edges = (k4 ++ Seq((5L, 1L), (2L, 1L))).toDF("x", "y")
    val out = Graph.triangleCounts(edges)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L), (5L, 0L)))
  }

  test("kCore: pendant chains peel layer by layer, the triangle core " +
    "survives; a coreless graph peels to empty") {
    // triangle {1,2,3} with tail 3-4-5: k=2 peels 5 (deg 1), then 4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("x", "y")
    val core = Graph.kCore(edges, k = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(core == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // a bare path has no 2-core
    assert(Graph.kCore(Seq((1L, 2L), (2L, 3L)).toDF("x", "y"), k = 2)
      .isEmpty)
    // k=1 keeps every non-isolated node with its true degree
    val k1 = Graph.kCore(edges, k = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(k1 == Seq((1L, 2L), (2L, 2L), (3L, 3L), (4L, 2L), (5L, 1L)))
  }

  test("coreness: full decomposition hand-checked — pendant chain 1, " +
    "triangle 2, K4 3; agrees with kCore at every k; edgeless input " +
    "is empty") {
    // K4 {1,2,3,4} + triangle {4,5,6} + tail 6-7-8
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L), (4L, 6L), (6L, 7L), (7L, 8L)))
      .toDF("x", "y")
    val out = Graph.coreness(edges)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L),
      (5L, 2L), (6L, 2L), (7L, 1L), (8L, 1L)))
    // cross-check the decomposition against the one-k operator: the
    // k-core's node set must be exactly {coreness >= k} for every k
    (1 to 3).foreach { k =>
      val core = Graph.kCore(edges, k)
        .select("node").as[Long].collect().toSet
      assert(core == out.filter(_._2 >= k).map(_._1).toSet, s"k=$k")
    }
    assert(Graph.coreness(edges.limit(0)).isEmpty)
  }

  test("coNeighborJaccard: hand-checked overlap ratios; a hub left node " +
    "is dropped from pair generation (side-local df-cap semantics)") {
    // users u1,u2 both touch items 10,20; u3 touches 20,30
    val e = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 20L), (3L, 30L))
      .toDF("user", "item")
    val out = Graph.coNeighborJaccard(e, "user", "item", threshold = 0.0)
      .orderBy("id_a", "id_b").as[(Long, Long, Long, Double)].collect().toSeq
    // |N(10)|=2 {1,2}, |N(20)|=3 {1,2,3}, |N(30)|=1 {3}
    assert(out == Seq(
      (10L, 20L, 2L, round6(2.0 / 3.0)),
      (20L, 30L, 1L, round6(1.0 / 3.0))))
    // a hub user touching everything would mint every pair — capped out
    val withHub = e.unionByName(
      (1L to 5L).map(i => (99L, i * 10L)).toDF("user", "item"))
    val capped = Graph.coNeighborJaccard(withHub, "user", "item",
      threshold = 0.0, maxLeftDegree = 4)
      .orderBy("id_a", "id_b").as[(Long, Long, Long, Double)].collect().toSeq
    assert(capped == out, "the hub's pairs (and its size contributions) must not appear")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
