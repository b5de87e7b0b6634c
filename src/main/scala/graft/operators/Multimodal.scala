package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus the decode / feature-extract
  * stage a training-data pipeline runs over them.
  *
  * The Spark-side shape is real and tested: binary payload column, struct
  * metadata, deterministic partition-parallel extraction via
  * `mapPartitions` over the binary bytes (the Scala analog of a
  * batch-arrow UDF — rows stream through one partition at a time, nothing
  * is collected). The actual codec call is STUBBED: this container has no
  * image/audio libraries, so [[FakeDecoder]] derives deterministic
  * pseudo-features from the bytes. On a real cluster, replace
  * [[FakeDecoder.decode]] with the codec (e.g. javax.imageio / ffmpeg
  * bindings) — the schema, batching and partitioning do not change.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType),
    StructField("media_type", StringType),
    StructField("byte_len", LongType)))

  /** Wrap a text corpus as opaque binary media payloads (the harness has
    * no real image bytes; utf-8 text bytes stand in — the plumbing is
    * identical for real media).
    */
  def asBinaryPayloads(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("text/plain").as("media_type"),
      octet_length(col(textCol)).cast("long").as("byte_len"))

  /** STUB decoder — deterministic fake features from raw bytes.
    * REPLACE on a real cluster: this is where the image/audio codec goes.
    */
  object FakeDecoder {
    final case class Decoded(width: Int, height: Int, features: Array[Float])

    def decode(payload: Array[Byte]): Decoded = {
      // ??? <- real codec call (e.g. ImageIO.read) goes here; the fake
      // derives stable pseudo-dimensions and an 8-dim feature sketch so the
      // pipeline shape (schema, batching, downstream joins) is testable.
      val n = payload.length
      val width = 64 + (if (n == 0) 0 else java.lang.Byte.toUnsignedInt(payload(0)) % 192)
      val height = 64 + (if (n < 2) 0 else java.lang.Byte.toUnsignedInt(payload(1)) % 192)
      val features = Array.tabulate(8) { i =>
        var acc = 0L
        var j = i
        while (j < n) { acc += java.lang.Byte.toUnsignedInt(payload(j)); j += 8 }
        (acc % 1000L).toFloat / 1000.0f
      }
      Decoded(width, height, features)
    }
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Partition-parallel decode/feature-extract over the payload column.
    * Streams rows (no driver collect); each partition is an independent
    * task — the same shape that runs a codec across 1000 executors.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    // decode is the expensive stage — spread a narrow scan first
    val rdd = graft.Tables.fanOut(
        media.select("doc_id", "payload", "media_type", "byte_len")).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val d = FakeDecoder.decode(r.getAs[Array[Byte]]("payload"))
          Row(r.getAs[Long]("doc_id"), r.getAs[String]("media_type"),
            r.getAs[Long]("byte_len"), d.width, d.height, d.features)
        }
      }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Deterministic frame sampling for time-media: pick every `stride`-th
    * chunk of the payload as a pseudo-frame (the real pipeline samples
    * decoded frames; the chunking/explode shape is the same).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames",
        greatest(lit(1L), (col("byte_len") / (frameBytes.toLong * stride)).cast("long")))
      .withColumn("frame_idx", explode(sequence(lit(0L), col("n_frames") - 1)))
      .select(
        col("doc_id"), col("frame_idx"),
        col("payload").substr((col("frame_idx") * frameBytes * stride + 1).cast("int"),
          lit(frameBytes)).as("frame_bytes"))
}
