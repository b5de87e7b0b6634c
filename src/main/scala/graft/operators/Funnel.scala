package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Ordered funnel analysis over an event stream — the conversion query of
  * product/behavioral analytics: for each entity, the earliest time it
  * completed step 1, then step 2 STRICTLY AFTER step 1, and so on
  * (signup → click → purchase). A step that never happens leaves that
  * and all later steps null — the entity "drops out" of the funnel.
  *
  * Scale shape: ONE shuffle by entity; each step is a conditional
  * windowed min over that same partitioning (whole-partition frame — no
  * sort, no further exchange; step i+1's condition reads step i's column
  * inside the same partition), then one aggregate collapses to a row
  * per entity — which AQE plans on the already-partitioned data. No
  * joins, no per-step passes over the corpus: the k-step funnel costs
  * one event-table scan regardless of k.
  *
  * Determinism: min over timestamps is order-free; the strict `>`
  * boundary is the declared semantics (an event in the same microsecond
  * as the previous step does not advance the funnel) and is replayed by
  * the oracle's independent join-chain formulation.
  */
object Funnel {

  /** Per-entity funnel times: (entity, t1..tk as step timestamps,
    * n_steps completed). Steps are event-type values matched in order.
    *
    * Only step-type events enter the plan: the `isin(steps)` filter is
    * pushed to the scan, so a 3-step funnel over a table with hundreds
    * of event types scans, shuffles, and window-buffers only the rows
    * the step conditions could ever match — at 100 TB that is the
    * difference between buffering an entity's whole history per task
    * and buffering just its funnel-relevant slice. Consequence of the
    * declared semantics: an entity with NO step-type events is not in
    * the funnel at all (no all-null row) — it never entered step 1's
    * candidate set, so it has no funnel state to report.
    */
  def funnelTimes(events: DataFrame, entityCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(entityCol))
    val base = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(entityCol), col(typeCol), col(tsCol))
    val withSteps = steps.zipWithIndex.foldLeft(base) { case (acc, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) > col(s"t$i")
      acc.withColumn(s"t${i + 1}", min(when(cond, col(tsCol))).over(w))
    }
    val stepCols = steps.indices.map(i => col(s"t${i + 1}"))
    withSteps
      .groupBy(col(entityCol))
      .agg(max(stepCols.head).as("t1"),
        stepCols.tail.zipWithIndex.map { case (c, i) => max(c).as(s"t${i + 2}") }: _*)
  }

  /** Per-step dwell-time distribution of a funnel: for each consecutive
    * step pair (i → i+1), how long entities that advanced took — the
    * "where does the funnel stall" follow-up to [[funnelTimes]]. Returns
    * one row per step pair: (step, step_pair, n, p50_us, p90_us).
    *
    * Scale shape: funnelTimes' single entity shuffle, then a map-only
    * explode to (step, dwell) rows and ONE aggregate over k−1 groups.
    * `exact = true` (default — the ORACLE ANCHOR, same split as
    * a6_percentiles) buffers each group's dwell values in the exact
    * `percentile`; `exact = false` is the 100 TB path — the same dwell
    * stream through the GK sketch (`approx_percentile`, O(accuracy)
    * memory per group), identical plan shape otherwise. FunnelSpec pins
    * the sketch inside the anchor's ±5-point rank envelope.
    *
    * Dwells are exact integer microsecond differences; a step that never
    * happened contributes nothing (nulls cascade out of funnelTimes, and
    * the strict `>` boundary makes every dwell positive).
    */
  def funnelDwell(events: DataFrame, entityCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String], exact: Boolean = true,
                  accuracy: Int = 10000): DataFrame = {
    require(steps.length >= 2, "dwell needs at least two steps")
    val ft = funnelTimes(events, entityCol, typeCol, tsCol, steps)
    val pairs = steps.indices.dropRight(1).map { i =>
      struct(lit(i + 1).as("step"),
        lit(s"${steps(i)}->${steps(i + 1)}").as("step_pair"),
        (unix_micros(col(s"t${i + 2}")) - unix_micros(col(s"t${i + 1}")))
          .as("dwell_us"))
    }
    ft.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.step"), col("p.step_pair"), col("p.dwell_us"))
      .filter(col("dwell_us").isNotNull)
      .groupBy(col("step"), col("step_pair"))
      .agg(count(lit(1)).as("n"),
        round(pctDwell(exact, 0.5, accuracy), 6).as("p50_us"),
        round(pctDwell(exact, 0.9, accuracy), 6).as("p90_us"))
  }

  /** Exact interpolated percentile (anchor) or the GK sketch (scale
    * path) over the dwell stream — cast to double so both paths share
    * one output schema.
    */
  private def pctDwell(exact: Boolean, p: Double, accuracy: Int): Column =
    if (exact) percentile(col("dwell_us"), lit(p))
    else percentile_approx(col("dwell_us"), lit(p), lit(accuracy)).cast("double")

  /** Cohort retention: entities cohorted by the week of their first
    * `anchorType` event, then each (cohort week, weeks-since) cell
    * counts the distinct entities active (ANY event) in that week —
    * the standard retention triangle.
    *
    * Scale shape: the cohort table is one aggregate by entity; activity
    * reduces to distinct (entity, week) BEFORE the cohort join, so the
    * join carries one row per entity-week, not per event; the final
    * cells are a two-phase distinct-count aggregate. All joins are
    * equi-joins on the entity / cohort-week keys — no windows, nothing
    * entity-quadratic.
    *
    * Output: (cohort_week yyyy-MM-dd, week_offset, n_active,
    * cohort_size, retention = n_active / cohort_size rounded to 6).
    * Week boundaries are Monday-start `date_trunc("week")` in both
    * engines; offsets are exact (week-truncated days are multiples
    * of 7).
    */
  def cohortRetention(events: DataFrame, entityCol: String, typeCol: String,
                      tsCol: String, anchorType: String): DataFrame = {
    val cohort = events.filter(col(typeCol) === anchorType)
      .groupBy(col(entityCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val acts = events
      .select(col(entityCol), date_trunc("week", col(tsCol)).as("act_week"))
      .distinct()
      .join(cohort, Seq(entityCol))
      .filter(col("act_week") >= col("cohort_week"))
      .withColumn("week_offset",
        (datediff(col("act_week"), col("cohort_week")) / 7).cast("long"))
    val sizes = cohort.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    acts.groupBy(col("cohort_week"), col("week_offset"))
      .agg(count_distinct(col(entityCol)).as("n_active"))
      .join(sizes, Seq("cohort_week"))
      .select(
        date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention"))
  }
}
