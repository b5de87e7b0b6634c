package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join handles sort-merge skew at runtime; salting is the
  * plan-level tool when one hot key would still swamp a single task (e.g. a
  * shingle shared by millions of documents, a null-ish default key). The
  * big side gets a deterministic per-row salt in [0, buckets); the small
  * side is replicated `buckets` times; the join key becomes (key, salt) so
  * the hot key's rows spread over `buckets` tasks.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, spreading each key over `buckets`
    * tasks. Row-deterministic salt (hash of the big row's columns), so
    * task retries re-produce the same routing.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     buckets: Int, joinType: String = "inner"): DataFrame = {
    // right/full-outer would emit each unmatched small-side row once per
    // replica (`buckets` duplicates) — those join types are not salvageable
    // under replication, so reject them up front
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")) ||
      allowed.contains(joinType.toLowerCase),
      s"saltedEquiJoin supports inner/left/semi/anti joins, not $joinType " +
        "(outer-preserved small-side rows would duplicate per salt bucket)")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(buckets.toLong)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
