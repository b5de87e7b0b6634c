package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sketches, TextAnalysis}

/** Count-min-sketch heavy hitters pinned against the exact token counts:
  * the estimate never undercounts, overshoot stays within eps·N, and the
  * Misra-Gries candidate stage keeps true heavy hitters even when its
  * counter budget is far below the vocabulary size.
  */
class SketchesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val eps = 1e-4

  private def toks = Tables.load(spark, sf, "documents")
    .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("token"))

  test("cms top-5 per language matches exact counts at this vocabulary size") {
    val est = Sketches.heavyHitters(toks, "lang", "token", k = 5, eps = eps)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exact = toks.groupBy("lang", "token").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val n = toks.count()
    assert(est.nonEmpty)
    est.foreach { case (key, e) =>
      val x = exact(key)
      assert(e >= x, s"$key: CMS undercounted ($e < $x)")
      assert(e - x <= (eps * n).ceil.toLong, s"$key: overshoot ${e - x} > eps*N")
    }
  }

  test("misra-gries candidates survive a counter budget below the vocabulary") {
    import spark.implicits._
    // 200 distinct rare tokens + one token covering >1/3 of the stream;
    // budget of 8 counters forces constant decrement churn.
    val rows = (1 to 200).flatMap(i => Seq.fill(2)(("g", s"rare$i"))) ++
      Seq.fill(300)(("g", "hot"))
    val df = rows.toDF("lang", "token").repartition(7)
    val top = Sketches.heavyHitters(df, "lang", "token", k = 1,
      eps = 1e-3, localCandidates = 8).collect()
    assert(top.length == 1 && top(0).getString(1) == "hot", top.mkString(";"))
    assert(top(0).getLong(2) >= 300)
  }

  test("deterministic under repartitioning (sketch merge is cell-addition)") {
    val a = Sketches.heavyHitters(toks.repartition(3), "lang", "token", k = 5, eps = eps)
      .orderBy("lang", "token").collect().toSeq
    val b = Sketches.heavyHitters(toks.repartition(17), "lang", "token", k = 5, eps = eps)
      .orderBy("lang", "token").collect().toSeq
    assert(a == b)
  }
}
