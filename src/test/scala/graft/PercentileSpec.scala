package graft

import graft.queries.ReferenceQueries

/** The approx-percentile scale path must track the exact anchor: with
  * accuracy 10000 and sf0.01 group sizes (~20k rows), the GK sketch's
  * rank error is ≤ n/10000 — a tiny relative value error on these
  * distributions. Assert 1% relative agreement per group and percentile.
  */
class PercentileSpec extends SparkSpec {

  test("approx percentiles within 1% of exact per group at sf0.01") {
    val sf = "/root/testdata/sf0.01"
    def byFlag(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = byFlag(ReferenceQueries.percentiles(spark, sf).collect())
    val approx = byFlag(ReferenceQueries.percentilesApprox(spark, sf).collect())
    assert(exact.keySet == approx.keySet)
    for (flag <- exact.keySet; i <- 0 until 3) {
      val (e, a) = (exact(flag)(i), approx(flag)(i))
      assert(math.abs(a - e) <= 0.01 * math.abs(e),
        s"group $flag percentile #$i: approx $a vs exact $e")
    }
  }
}
