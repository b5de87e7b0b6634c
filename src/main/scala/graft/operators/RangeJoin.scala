package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Band (interval) join: all pairs (l, r) with
  * `r.ts ∈ [l.ts + lo, l.ts + hi]` — "events within a minute of an
  * error", "readings during an outage window". Spark has no range-join
  * strategy: an inequality-only condition plans as
  * BroadcastNestedLoopJoin, a quadratic scan that dies at corpus scale.
  *
  * The distributed shape is BUCKETIZATION (the same trick behind
  * Databricks' range-join hint and DuckDB's IEJoin alternative for
  * equi-less intervals): with bin width W = hi − lo, a left row's window
  * touches at most two W-bins, so the left side explodes to ≤ 2 bin
  * keys, the right side computes its single bin, and the pair space
  * reduces to an EQUI-join on the bin key plus an exact filter. Work per
  * left row is bounded by the right-side density of a 2W time span —
  * linear, shuffle-partitioned by bin, no nested loop anywhere.
  *
  * Timestamps are compared in integer microseconds (exact; no float
  * time arithmetic). Bounds are inclusive on both ends.
  *
  * Skew note: a bin is a hash-shuffle key, so a right-side burst (every
  * event in one W-wide spike) concentrates one key the same way a hot
  * LSH bucket does — AQE skew-join splits it at runtime; for
  * pathological spikes, pre-aggregate the right side per bin or shrink
  * W and explode the left to more bins.
  */
object RangeJoin {

  /** Left columns survive as-is plus `__lts`; right contributes `rCols`
    * (renamed if colliding). Returns the matched pairs only — wrap with a
    * left join against the original left side for outer semantics (see
    * [[countInBand]]).
    */
  def bandJoin(left: DataFrame, right: DataFrame, leftTs: Column,
               rightTs: Column, loUs: Long, hiUs: Long): DataFrame = {
    require(hiUs > loUs, "empty band: hi must exceed lo")
    val w = hiUs - loUs
    // integer `div`, never float division: epoch micros (~1.7e15) divided
    // as double can land a hair below an exact bin boundary and truncate
    // into the wrong bin (same pitfall as Tables.load's nanos handling).
    // `div` truncates toward zero = floor for the positive-epoch
    // timestamps this targets.
    val l = left.withColumn("__lts", unix_micros(leftTs))
      .withColumn("__bin", explode(array_distinct(array(
        expr(s"(__lts + ${loUs}L) div ${w}L"),
        expr(s"(__lts + ${hiUs}L) div ${w}L")))))
    val r = right.withColumn("__rts", unix_micros(rightTs))
      .withColumn("__bin", expr(s"__rts div ${w}L"))
    // a right row has exactly ONE bin, and the left bins are distinct, so
    // a qualifying pair matches exactly once — no dedup needed
    l.join(r, Seq("__bin"))
      .filter(col("__rts") >= col("__lts") + loUs &&
              col("__rts") <= col("__lts") + hiUs)
      .drop("__bin")
  }

  /** Per-left-row count of right rows inside the band, zero included —
    * the common "how many X happened around each Y" aggregation. `keyCol`
    * must uniquely key `left`.
    */
  def countInBand(left: DataFrame, right: DataFrame, keyCol: String,
                  leftTs: Column, rightTs: Column, loUs: Long,
                  hiUs: Long): DataFrame = {
    val matched = bandJoin(left.select(col(keyCol), leftTs),
        right.select(rightTs), leftTs, rightTs, loUs, hiUs)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_in_band"))
    left.select(col(keyCol))
      .join(matched, Seq(keyCol), "left")
      .na.fill(0L, Seq("n_in_band"))
  }
}
