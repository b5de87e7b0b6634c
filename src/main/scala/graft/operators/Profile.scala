package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** One-pass column profiler — the "what is actually in this table" scan
  * every ingestion run does before trusting a new drop: per column, row
  * count, null count, exact distinct count, and the min/max of the
  * string rendering. The reference's audit stage derives per-file
  * metrics (`scr/etl_incremental_audit.py:151-214` builds counts and
  * reject ratios per load); this is the column-oriented generalization.
  *
  * Scale shape: ONE scan of the table. The k per-column distinct counts
  * make Catalyst plan an Expand (k× the input into the partial
  * aggregate) — CPU, not shuffle: after map-side partial aggregation
  * each partition ships one row per column, so the exchange is k rows
  * per partition regardless of corpus size. The result is k rows total;
  * the unpivot to long form is driver-free (a `stack` projection over
  * the 1-row aggregate).
  *
  * Value contract (same as Cdc.rowHash, documented there): min/max and
  * distinct operate on `CAST(col AS STRING)`, which is engine-portable
  * for string and integral columns only — doubles/timestamps/booleans
  * render differently across engines; canonicalize them first.
  */
object Profile {

  /** Long-form profile: one row per requested column —
    * (col_name, n_rows, n_nulls, n_distinct, min_val, max_val).
    *
    * Column names are DATA here, never SQL text: each is resolved by
    * exact schema match and addressed through a backtick-escaped typed
    * Column, internal aliases are index-based, and the unpivot is an
    * explode over typed structs — a name carrying spaces, dots, quotes
    * or backticks profiles like any other (no expression injection into
    * the plan).
    *
    * `exact = true` (default, the oracle anchor) computes exact distinct
    * counts — the k-way Expand is k× the input through the PARTIAL
    * aggregate, and the per-column hash tables it feeds are
    * cardinality-sized. `exact = false` is the 100 TB first-contact
    * path: HLL++ `approx_count_distinct` at rsd 0.01 replaces each
    * distinct hash table with a fixed-size register set — no Expand, one
    * bounded sketch per column per partition, error ~1% (spec-pinned
    * within 2% of the exact anchor). Same anchor/scale split as the
    * percentile consumers (Funnel/Outliers `exact` parameters).
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such column(s): ${missing.mkString(", ")}")
    def ref(c: String) = col(s"`${c.replace("`", "``")}`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val s = ref(c).cast("string")
      val nd = if (exact) countDistinct(s) else approx_count_distinct(s, rsd = 0.01)
      Seq(count(s).as(s"__cnt_$i"),
        nd.as(s"__nd_$i"),
        min(s).as(s"__min_$i"),
        max(s).as(s"__max_$i"))
    } :+ count(lit(1)).as("__n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"),
        (col("__n_rows") - col(s"__cnt_$i")).as("n_nulls"),
        col(s"__nd_$i").as("n_distinct"),
        col(s"__min_$i").as("min_val"),
        col(s"__max_$i").as("max_val"))
    }
    one.select(col("__n_rows").as("n_rows"), explode(array(entries: _*)).as("p"))
      .select(col("p.col_name"), col("n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_val"), col("p.max_val"))
  }

  /** MERGEABLE per-drop profile sketch — the incremental twin of
    * [[profile]]: one row per column holding the partial-aggregatable
    * state (value/row counts, min/max, and a DataSketches HLL register
    * set as BINARY) instead of finished numbers. Persist one sketch
    * table per ingested drop (plain parquet — the binary column
    * round-trips), and "profile the whole corpus after the Nth drop"
    * becomes [[mergeSketches]] over N model-sized rows-per-column —
    * never a re-scan of 100 TB of already-profiled data.
    *
    * Output: (col_name, n_rows, n_vals, sketch, min_val, max_val).
    * Same one-scan shape and column-name-as-data hygiene as [[profile]].
    */
  def sketch(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "sketch needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"sketch: no such column(s): ${missing.mkString(", ")}")
    def ref(c: String) = col(s"`${c.replace("`", "``")}`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val s = ref(c).cast("string")
      Seq(count(s).as(s"__cnt_$i"),
        hll_sketch_agg(s).as(s"__hll_$i"),
        min(s).as(s"__min_$i"),
        max(s).as(s"__max_$i"))
    } :+ count(lit(1)).as("__n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"),
        col(s"__cnt_$i").as("n_vals"),
        col(s"__hll_$i").as("sketch"),
        col(s"__min_$i").as("min_val"),
        col(s"__max_$i").as("max_val"))
    }
    one.select(col("__n_rows").as("n_rows"), explode(array(entries: _*)).as("p"))
      .select(col("p.col_name"), col("n_rows"), col("p.n_vals"),
        col("p.sketch"), col("p.min_val"), col("p.max_val"))
  }

  /** Merge [[sketch]] partials into ONE still-mergeable sketch table —
    * the [[SketchStore.compact]] primitive: counts and min/max fold
    * exactly; HLL registers UNION into a sketch (not an estimate).
    * Estimates read off a nested union can move within the sketch's
    * error bound (the DataSketches union estimator is nesting-
    * sensitive), exactly the tolerance every HLL readout carries.
    * Output schema = [[sketch]] output schema.
    */
  def mergeSketchPartials(sketches: DataFrame): DataFrame =
    sketches.groupBy("col_name").agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_vals")).as("n_vals"),
        hll_union_agg(col("sketch")).as("sketch"),
        min(col("min_val")).as("min_val"),
        max(col("max_val")).as("max_val"))
      .select(col("col_name"), col("n_rows"), col("n_vals"), col("sketch"),
        col("min_val"), col("max_val"))

  /** Merge any number of [[sketch]] tables (unioned, one or many drops)
    * into the [[profile]] output shape. Counts/min/max merge exactly;
    * n_distinct is the HLL union's estimate (ProfileOutliersSpec pins
    * union-of-drops ≡ whole-corpus within the sketch tolerance). The
    * input is rows-per-column × drops — model-sized; the merge never
    * touches corpus data.
    */
  def mergeSketches(sketches: DataFrame): DataFrame =
    sketches.groupBy("col_name").agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_vals")).as("n_vals"),
        hll_sketch_estimate(hll_union_agg(col("sketch"))).as("n_distinct"),
        min(col("min_val")).as("min_val"),
        max(col("max_val")).as("max_val"))
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_vals")).as("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
}
