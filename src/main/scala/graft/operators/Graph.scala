package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame}

/** Event-graph analytics: first-order Markov transition extraction over an
  * event stream, and weighted PageRank over the resulting (or any) edge
  * list. The behavioral-analytics counterpart of the reference's audit
  * aggregations (`scr/etl_incremental_audit.py` derives per-file metrics;
  * here we derive per-transition metrics) re-expressed at corpus scale.
  *
  * Scale shape:
  *   - `transitions` costs ONE shuffle by entity (the per-entity `lead`
  *     window) plus a tiny aggregation to the (src, dst) edge list — the
  *     edge list is bounded by |event-type vocabulary|², independent of
  *     corpus size, so everything after the window is model-sized.
  *   - `pageRank` iterates join + aggregate on the EDGE list, never on the
  *     raw events: per iteration one join of edges with the rank vector
  *     (node-sized — AQE broadcasts it when small) and one grouped sum.
  *     For a type-transition graph that is dozens of rows; for a general
  *     graph it stays fully distributed — no driver collect anywhere.
  *
  * Determinism: every cross-row sum funnels through the fixed-point
  * quantizer (floor ×1e12 → exact DECIMAL(38,0) sum → double), the same
  * grid the quality-model/DSIR oracles replay, so ranks are bit-identical
  * regardless of partitioning and across engines. Per-row ops (double
  * division, multiplication) are IEEE-754 deterministic.
  */
object Graph {

  private val Quantum = 1.0e12
  private val Clamp = 1.0e6

  /** Fixed-point exact sum: order-free and engine-portable. */
  private def qsum(term: Column): Column =
    sum(floor(least(greatest(term, lit(-Clamp)), lit(Clamp)) * lit(Quantum))
      .cast(DecimalType(38, 0))).cast("double") / lit(Quantum)

  /** First-order transition matrix: for each entity's event sequence
    * (ordered by `tsCol`, ties broken by `tieCol`), count src→dst
    * transitions and the conditional probability p = n / out(src).
    *
    * Output: (src, dst, n, p) — one row per observed transition pair.
    * The division is a single double op (exact same result in any
    * engine); p needs no quantizer.
    */
  def transitions(events: DataFrame, entityCol: String, typeCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    val edges = events
      .select(col(entityCol), col(typeCol), col(tsCol), col(tieCol))
      .withColumn("dst", lead(col(typeCol), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col(typeCol).as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    // out-degree totals: a second window over the already model-sized edge
    // list (≤ |types|² rows) — not a corpus-scale shuffle
    val wSrc = Window.partitionBy(col("src"))
    edges
      .withColumn("out_n", sum(col("n")).over(wSrc))
      .select(col("src"), col("dst"), col("n"),
        (col("n").cast("double") / col("out_n").cast("double")).as("p"))
  }

  /** Weighted PageRank over an edge list (srcCol, dstCol, weightCol), a
    * fixed number of synchronous iterations:
    *
    *   rank'(v) = (1-d)/N + d * ( Σ_{u→v} rank(u)·w(u,v)/out(u)
    *                              + dangling/N )
    *
    * where `dangling` is the summed rank of nodes with no out-edges
    * (their mass is redistributed uniformly — the standard treatment).
    *
    * Fully distributed: the per-iteration state is one (node, rank) row
    * per node; each iteration is edges ⋈ ranks + a grouped qsum. The rank
    * DataFrame is `localCheckpoint`ed eagerly each iteration so the plan
    * stays O(1) deep and the ContextCleaner can reclaim blocks (the
    * engine-wide cache discipline, commit e3d8d67).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, iters: Int = 5,
               damping: Double = 0.85, tol: Double = 0.0): DataFrame =
    pageRankCounted(edges, srcCol, dstCol, weightCol, iters, damping, tol)._1

  /** [[pageRank]] plus the number of iterations actually run — the spec
    * hook for the convergence stop. `tol > 0` adds an L1-delta check per
    * round (one more model-sized aggregate, read as a 1-row collect) and
    * stops as soon as Σ|rank′−rank| < tol; `tol = 0` (default — the
    * oracle anchor) always runs the fixed `iters`.
    */
  private[graft] def pageRankCounted(edges: DataFrame, srcCol: String,
                                     dstCol: String, weightCol: String,
                                     iters: Int = 5, damping: Double = 0.85,
                                     tol: Double = 0.0): (DataFrame, Int) = {
    require(iters >= 1, "pageRank needs at least one iteration")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("double").as("w"))

    // out-weights use a wide exact decimal (not the ±1e6-clamped qsum grid):
    // edge weights are typically counts that exceed the clamp at corpus
    // scale; DECIMAL(38,6) keeps the sum exact and order-free to 1e32
    val outw = e.groupBy("src")
      .agg(sum(col("w").cast(DecimalType(38, 6))).cast("double").as("out_w"))
    // transition probability per edge: one double division, deterministic
    val pe = e.join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("out_w")).as("p"))
      .localCheckpoint(true)

    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge list (no nodes found)")
    val nD = lit(n.toDouble)
    val base = lit(1.0 - damping) / nD
    val d = lit(damping)

    // src side of pe, for the dangling-mass anti-join
    val srcs = pe.select(col("src").as("node")).distinct().localCheckpoint(true)

    var ranks = nodes.select(col("node"), (lit(1.0) / nD).as("rank"))
      .localCheckpoint(true)
    var ran = 0
    var converged = false
    while (ran < iters && !converged) {
      val incoming = pe.join(ranks, pe("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(qsum(col("rank") * col("p")).as("inc"))
      // dangling mass: aggregate over an anti-join — empty set sums to null
      val dangling = ranks.join(srcs, Seq("node"), "left_anti")
        .agg(coalesce(qsum(col("rank")), lit(0.0)).as("dang"))
      val next = nodes
        .join(incoming, nodes("node") === incoming("dst"), "left")
        .crossJoin(dangling)
        .select(col("node"),
          (base + d * (coalesce(col("inc"), lit(0.0)) + col("dang") / nD))
            .as("rank"))
        .localCheckpoint(true)
      ran += 1
      if (tol > 0.0 && ran < iters) {
        // L1 movement this round: node-sized join of the two checkpointed
        // rank vectors, ONE row back to the driver
        val delta = next.join(ranks.select(col("node"), col("rank").as("prev")), "node")
          .agg(coalesce(qsum(abs(col("rank") - col("prev"))), lit(0.0)))
          .head().getDouble(0)
        converged = delta < tol
      }
      ranks = next
    }
    (ranks, ran)
  }
}
