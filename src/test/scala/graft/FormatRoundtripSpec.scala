package graft

import org.apache.spark.sql.functions._

/** Source/sink breadth: the warehouse's tables survive roundtrips through
  * every built-in columnar/row format a Spark deployment actually uses —
  * parquet (the default), ORC, JSON lines, and header CSV — with values
  * intact. Schema fidelity differs by format (JSON/CSV are text: ints
  * widen, so the compare casts through the original schema).
  */
class FormatRoundtripSpec extends SparkSpec {
  import spark.implicits._

  private lazy val source =
    Tables.load(spark, "/root/testdata/sf0.001", "supplier")
      .select("s_suppkey", "s_name", "s_acctbal")

  private def collectSorted(df: org.apache.spark.sql.DataFrame) =
    df.select(col("s_suppkey").cast("long"), col("s_name"),
        col("s_acctbal").cast("double"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq

  test("parquet / orc / json / csv sinks roundtrip the same rows") {
    val want = collectSorted(source)
    val base = tempDir("fmt")
    source.write.mode("overwrite").parquet(s"$base/p")
    source.write.mode("overwrite").orc(s"$base/o")
    source.write.mode("overwrite").json(s"$base/j")
    source.write.mode("overwrite").option("header", "true").csv(s"$base/c")

    assert(collectSorted(spark.read.parquet(s"$base/p")) == want)
    assert(collectSorted(spark.read.orc(s"$base/o")) == want)
    assert(collectSorted(spark.read.json(s"$base/j")) == want)
    assert(collectSorted(
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(s"$base/c")) == want)
  }
}
