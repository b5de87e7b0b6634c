package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Time-series resampling: fixed-interval bucketing with gap-filling —
  * the operator that turns an irregular event stream into the regular
  * grid downstream models and dashboards consume (cf. the reference's
  * per-run event readback, generalized to the standard resample/ffill
  * family every time-series store exposes).
  *
  * Scale shape: one partial+final aggregate to a (key, bucket) grid
  * (shuffle on the composite key), a per-key `sequence` explode bounded
  * by span/interval — never a cross join against a global calendar —
  * and the forward-fill window partitions BY KEY (thousands of
  * independent partitions on a cluster; no global window, no single
  * partition). The carried value rides `last(_, ignoreNulls)` over the
  * dense grid, so fill cost is linear in grid rows.
  */
object Resample {

  /** Resample `df` to `intervalSec`-wide buckets per `keyCol`: one row
    * for EVERY bucket between each key's first and last event (gaps
    * included), carrying `n_events` (0 on gaps) and `value_ffill` = the
    * value of the latest event at or before the bucket (latest by
    * (tsCol, tieCol) — deterministic under ties). Bucket ids are epoch
    * microseconds divided by the interval (integer division — exact).
    */
  def ffill(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
            tieCol: String, intervalSec: Long): DataFrame = {
    val intervalUs = intervalSec * 1000000L
    // integer `div`, not `/`: double division of epoch micros can round
    // across a bucket boundary (same pitfall as Tables.load's ns→µs)
    val bucket: Column = expr(s"unix_micros(`$tsCol`) div CAST($intervalUs AS BIGINT)")
    val perBucket = df
      .select(col(keyCol), bucket.as("bucket"), col(valueCol).as("__v"),
        struct(col(tsCol), col(tieCol)).as("__ord"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n_events"), max_by(col("__v"), col("__ord")).as("__last"))
    // dense per-key grid: bounded by each key's own span / interval
    val grid = perBucket.groupBy(col(keyCol))
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("__last"), ignoreNulls = true).over(w).as("value_ffill"))
  }
}
