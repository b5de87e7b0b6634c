package graft

import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Pins `Tables.load`'s embeddings element-width normalization — the
  * same defense class as EventsLoaderSpec: every graft vector
  * expression reads `getFloat`, so a harness regeneration shipping
  * `array<double>` must normalize at the loader, not corrupt the ANN
  * family at scoring time. Fixtures carry identical values in both
  * widths (all exactly representable transitions verified by value).
  */
class EmbeddingsLoaderSpec extends SparkSpec {

  private def fixture(kind: String): String = {
    val url = getClass.getClassLoader.getResource(s"embeddings_fixture/$kind/embeddings.parquet")
    assert(url != null, s"missing fixture embeddings_fixture/$kind")
    new java.io.File(url.toURI).getParent
  }

  private def load(kind: String) = {
    val df = Tables.load(spark, fixture(kind), "embeddings")
    assert(df.schema("embedding").dataType == ArrayType(FloatType, containsNull = true) ||
      df.schema("embedding").dataType == ArrayType(FloatType, containsNull = false),
      s"$kind: embedding must normalize to array<float>, got ${df.schema("embedding").dataType}")
    df
  }

  test("float-encoded and double-encoded embeddings load to identical vectors") {
    val f = load("float").orderBy("vec_id").collect().map(_.getSeq[Float](1))
    val d = load("double").orderBy("vec_id").collect().map(_.getSeq[Float](1))
    assert(f.nonEmpty)
    assert(f.toSeq.map(_.toSeq) == d.toSeq.map(_.toSeq))
  }

  test("vector expressions run on the normalized column") {
    import org.apache.spark.sql.functions.col
    val df = load("double")
    val c = df.select(graft.functions.cosine_similarity(
      col("embedding"), col("embedding")).as("c")).collect().map(_.getDouble(0))
    assert(c.forall(v => math.abs(v - 1.0) < 1e-9 || v == 0.0))
  }

  test("current harness testdata loads as array<float>") {
    val dir = "/root/testdata/sf0.001"
    if (new java.io.File(s"$dir/embeddings.parquet").exists()) {
      val df = Tables.load(spark, dir, "embeddings")
      assert(df.schema("embedding").dataType.isInstanceOf[ArrayType])
      assert(df.schema("embedding").dataType.asInstanceOf[ArrayType].elementType == FloatType)
    }
  }
}
