package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.interleave_bits

/** Z-order (Morton-curve) clustering for multi-column data skipping.
  *
  * A table range-partitioned and sorted by ONE column prunes scans on that
  * column only; predicates on a second column read everything. Sorting by
  * the Morton interleave of both columns keeps each file's bounding box
  * SMALL IN EVERY DIMENSION, so parquet min/max row-group statistics prune
  * scans filtered on either column (or both) — the standard lakehouse
  * OPTIMIZE ZORDER layout move, here as a write-path operator.
  *
  * Scale shape: one bounded aggregate computes the per-column min/max
  * (2 numbers per column per task cross the wire); normalization and the
  * interleave are a map-only codegen projection; the clustered write is
  * `repartitionByRange(zcode)` (one range shuffle — the same cost a
  * single-column sorted write pays) + `sortWithinPartitions`. Nothing is
  * collected except the 4 scaling constants.
  *
  * Determinism: scaling is pure BIGINT arithmetic — offset from the
  * column min, right-shifted to the top `bits` bits — so codes are
  * identical across engines and partitionings (full SQL oracle on the
  * code query).
  */
object ZOrder {

  /** Scaling constants: per-column (min, max) — one bounded job. */
  def bounds(df: DataFrame, colA: String, colB: String): (Long, Long, Long, Long) = {
    val r = df.agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** Map-only Morton code column: each input offset from its min and
    * aligned to exactly `bits` bits — wide spans truncate to their top
    * `bits` bits, narrow spans shift UP to fill the width. The alignment
    * matters: interleaving leaves the most-significant bits of BOTH
    * dimensions in the code's top bits, so the curve subdivides both
    * ranges evenly (un-aligned spans degenerate toward a linear sort on
    * the wider column). Pure shifts — exact integer arithmetic, no float
    * division anywhere.
    */
  def zCode(colA: Column, boundsA: (Long, Long), colB: Column,
            boundsB: (Long, Long), bits: Int = 16): Column = {
    require(bits <= 31, "2*bits must stay in a long")
    def scaled(c: Column, lo: Long, hi: Long): Column = {
      val span = hi - lo
      val need = 64 - java.lang.Long.numberOfLeadingZeros(span) // bits in span
      val off = c.cast("long") - lit(lo)
      if (need >= bits) shiftrightunsigned(off, need - bits)
      else shiftleft(off, bits - need)
    }
    interleave_bits(scaled(colA, boundsA._1, boundsA._2),
      scaled(colB, boundsB._1, boundsB._2), bits)
  }

  /** The input with a `zcode` column (bounds measured from the data). */
  def withZCode(df: DataFrame, colA: String, colB: String,
                bits: Int = 16): DataFrame = {
    val (loA, hiA, loB, hiB) = bounds(df, colA, colB)
    df.withColumn("zcode",
      zCode(col(colA), (loA, hiA), col(colB), (loB, hiB), bits))
  }

  /** Z-clustered layout: range-partition and sort by the Morton code, so
    * every output file covers a small rectangle of (colA, colB) space and
    * min/max stats prune reads on either column. `numFiles` sizes the
    * layout (at real scale: target file size / row width).
    */
  def zOrdered(df: DataFrame, colA: String, colB: String, numFiles: Int,
               bits: Int = 16): DataFrame =
    withZCode(df, colA, colB, bits)
      .repartitionByRange(numFiles, col("zcode"))
      .sortWithinPartitions("zcode")

  /** Per-output-partition bounding boxes — the skipping evidence: after a
    * z-ordered layout, each partition's (colA, colB) box is small in BOTH
    * dimensions (a linear sort shrinks only its leading column). Used by
    * the spec; at real scale these are the parquet footer min/max stats.
    */
  def partitionBounds(laidOut: DataFrame, colA: String, colB: String): DataFrame =
    laidOut.withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min(col(colA)).as("min_a"), max(col(colA)).as("max_a"),
        min(col(colB)).as("min_b"), max(col(colB)).as("max_b"),
        count(lit(1)).as("n"))
}
