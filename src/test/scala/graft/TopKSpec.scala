package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.cosine_similarity
import graft.plans.TopKPerKey
import graft.plans.TopK

/** TopKPerKey custom operator: equivalence with the window row_number
  * formulation, and the partial/final + exchange plan shape.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("matches window row_number top-k on scored pairs") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = broadcast(embs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv")))
    val scored = embs.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine_similarity(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "cosine")

    val viaOperator = TopK.perKey(scored, Seq(col("query_id")),
        Seq(col("cosine").desc, col("neighbor_id").asc), k = 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet

    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    val viaWindow = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet

    assert(viaOperator == viaWindow)
    assert(viaOperator.size == 8 * 5)
  }

  test("rows within each key come out ordered") {
    val df = Seq((1, 9.0), (1, 3.0), (1, 7.0), (1, 1.0), (2, 5.0), (2, 6.0))
      .toDF("k", "v")
    val r = TopK.perKey(df, Seq(col("k")), Seq(col("v").desc), k = 2)
      .as[(Int, Double)].collect().toSeq
    assert(r.filter(_._1 == 1).map(_._2) == Seq(9.0, 7.0))
    assert(r.filter(_._1 == 2).map(_._2) == Seq(6.0, 5.0))
  }

  test("plan: partial + exchange + final, no sort of the full input") {
    val df = Seq((1, 2.0), (2, 3.0)).toDF("k", "v")
    val topk = TopK.perKey(df, Seq(col("k")), Seq(col("v").asc), k = 1)
    topk.collect()
    val plan = topk.queryExecution.executedPlan.toString
    // final + partial around a hash exchange, never a full-input Sort
    assert("TopKPerKey 1".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("Exchange hashpartitioning(k"), plan)
    assert(!plan.contains("Sort "), plan)
  }

  test("partial overflow flush: tiny key budget, many keys, same results") {
    // 200 keys but a 3-key partial budget: the map-side stage must flush
    // repeatedly; the final stage re-reduces the >k-per-key shuffle rows
    val df = (1 to 4000).map(i => (i % 200, (i * 2654435761L % 97).toDouble))
      .toDF("k", "v").repartition(5)
    val got = TopK.perKey(df, Seq(col("k")), Seq(col("v").desc, col("k")), k = 3,
        maxKeysInMemory = 3)
      .select("k", "v").as[(Int, Double)].collect().toSeq.sorted
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("k"))
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("k", "v").as[(Int, Double)].collect().toSeq.sorted
    assert(got == want)
  }

  test("ties and fewer-than-k groups handled") {
    val df = Seq((1, 5.0), (1, 5.0), (2, 1.0)).toDF("k", "v")
    val r = TopK.perKey(df, Seq(col("k")), Seq(col("v").asc), k = 3)
      .as[(Int, Double)].collect()
    assert(r.count(_._1 == 1) == 2 && r.count(_._1 == 2) == 1)
  }
}
