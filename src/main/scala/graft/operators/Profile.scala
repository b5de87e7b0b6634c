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
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(count(s).as(s"__cnt_$c"),
        countDistinct(s).as(s"__nd_$c"),
        min(s).as(s"__min_$c"),
        max(s).as(s"__max_$c"))
    } :+ count(lit(1)).as("__n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', __n_rows - __cnt_$c, __nd_$c, __min_$c, __max_$c")
      .mkString(", ")
    one.selectExpr("__n_rows AS n_rows",
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_val, max_val)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }
}
