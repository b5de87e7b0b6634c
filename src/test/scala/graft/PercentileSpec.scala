package graft

import graft.queries.ReferenceQueries

/** The sketch scale paths must track their exact anchors: with accuracy
  * 10000 and sf0.01 group sizes (~20k rows), the GK sketch's rank error
  * is ≤ n/10000 — a tiny relative value error on these distributions.
  * Assert 1% relative agreement per group and percentile; DataSketches
  * HLL distinct estimates at lgConfigK = 14 must sit within 2%.
  */
class PercentileSpec extends SparkSpec {

  test("approx distinct counts within 2% of exact per group at sf0.01") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.01"
    val approx = ReferenceQueries.distinctApprox(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = graft.Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_orderkey")).as("nd_order"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    for (flag <- exact.keySet) {
      val (ep, eo) = exact(flag); val (ap, ao) = approx(flag)
      assert(math.abs(ap - ep) <= 0.02 * ep, s"$flag parts: $ap vs $ep")
      assert(math.abs(ao - eo) <= 0.02 * eo, s"$flag orders: $ao vs $eo")
    }
  }

  test("rfm sketch-boundary scores match the exact anchor for ≥98% of users at sf0.01") {
    val sf = "/root/testdata/sf0.01"
    def scores(exact: Boolean) =
      ReferenceQueries.eventsRfmWith(spark, sf, exact = exact)
        .select("user_id", "r_score", "f_score", "m_score").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val e = scores(true)
    val a = scores(false)
    assert(e.keySet == a.keySet && e.nonEmpty)
    val moved = e.keySet.count(u => e(u) != a(u))
    assert(moved <= math.max(1, (0.02 * e.size).toInt), s"$moved of ${e.size} moved")
    // and any movement is a single-quintile boundary flip, never a jump
    e.keySet.foreach { u =>
      val ((er, ef, em), (ar, af, am)) = (e(u), a(u))
      assert(math.abs(er - ar) <= 1 && math.abs(ef - af) <= 1 && math.abs(em - am) <= 1,
        s"user $u: $e vs $a")
    }
  }

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
