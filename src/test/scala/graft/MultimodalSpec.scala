package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: payload schema, partition-parallel stub decode,
  * frame sampling shapes, and chaining decoded features into similarity.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asBinaryPayloads(
    Tables.load(spark, "/root/testdata/sf0.001", "documents"), "text", "doc_id")

  test("payload schema and byte lengths") {
    val row = media.orderBy("doc_id").head()
    assert(row.schema.fieldNames.toSeq ==
      Seq("doc_id", "payload", "media_type", "byte_len"))
    assert(row.getAs[Array[Byte]]("payload").length == row.getAs[Long]("byte_len"))
  }

  test("stub decode is deterministic and partition-parallel") {
    val a = Multimodal.decodeFeatures(media).orderBy("doc_id").collect()
    val b = Multimodal.decodeFeatures(media.repartition(7)).orderBy("doc_id").collect()
    assert(a.length == 500)
    // same features regardless of partitioning
    assert(a.map(r => r.getSeq[Float](r.fieldIndex("features")).toList).toSeq ==
      b.map(r => r.getSeq[Float](r.fieldIndex("features")).toList).toSeq)
    assert(a.forall { r =>
      val f = r.getSeq[Float](r.fieldIndex("features"))
      f.length == 8 && f.forall(v => v >= 0f && v < 1f)
    })
  }

  test("frame sampling: frame count tracks payload size") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 4)
    val perDoc = frames.groupBy("doc_id").count()
      .join(media.select(col("doc_id"), col("byte_len")), "doc_id")
      .collect()
    assert(perDoc.forall { r =>
      val expected = math.max(1L, r.getAs[Long]("byte_len") / (32L * 4L))
      r.getAs[Long]("count") == expected
    })
    val f0 = frames.filter(col("frame_idx") === 0).head()
    assert(f0.getAs[Array[Byte]]("frame_bytes").length <= 32)
  }

  test("decoded features chain into cosine similarity search") {
    val feats = Multimodal.decodeFeatures(media)
      .select(col("doc_id"), col("features"))
    val q = feats.filter(col("doc_id") < 2)
      .select(col("doc_id").as("query_id"), col("features").as("qf"))
    val scored = feats.join(broadcast(q), col("query_id") =!= col("doc_id"))
      .withColumn("sim", graft.functions.cosine_similarity(col("qf"), col("features")))
    assert(scored.filter(col("sim") > 0).count() > 0)
  }
}
