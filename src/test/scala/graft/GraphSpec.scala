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
}
