package graft

/** Blanket plan audit over EVERY registered query: no plan may contain a
  * cartesian product or a nested-loop join — the two shapes that are
  * quadratic in input size and silently "work" at test SF while being
  * non-starters at corpus scale. Individual shape assertions (broadcast
  * direction, pushdown, codegen) live in PlanSpec; this is the safety net
  * that newly added queries can't slip past.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose nested-loop is the DECLARED shape, not an accident:
    * - dedup_embedding_exact: all-pairs cosine on an explicitly bounded
    *   500-vector subset — it exists as the exact verifier for the LSH
    *   path, and documents its bound.
    * - sim_topk_bruteforce: corpus scanned once against a BROADCAST
    *   handful of queries — linear in the corpus, the correct baseline.
    * - sim_topk_pq: the ADC pass streams the (m-byte) encoded corpus once
    *   against the broadcast per-query lookup tables — linear in the
    *   corpus by design, and the refine join is candidates-only.
    */
  private val intendedNestedLoop = Set(
    "dedup_embedding_exact", "sim_topk_bruteforce", "sim_topk_pq",
    // compositions OVER the brute-force baseline inherit its declared
    // broadcast-nested-loop (corpus streamed once against broadcast
    // queries — linear in the corpus):
    "sim_eval_recall",     // ground-truth side of the recall metric
    "sim_label_knn",       // votes over the exact top-5
    "sim_hard_negatives",  // same scan with the label predicate added
    "retrieval_hybrid_rrf",  // vector side is the brute-force baseline
    "dedup_eval_hashembed",  // all-pairs verifier on the bounded 500-doc slice
    "mm_dedup_eval")         // exact all-pairs ground truth, same bounded slice

  test("no registered query plans a cartesian product or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val checks = Seq("CartesianProduct") ++
        (if (intendedNestedLoop(name)) Nil else Seq("BroadcastNestedLoopJoin"))
      val bad = checks.filter(plan.contains)
      if (bad.nonEmpty) Some(s"$name: ${bad.mkString(", ")}") else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
