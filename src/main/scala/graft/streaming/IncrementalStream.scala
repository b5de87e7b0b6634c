package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.ValidatingTransform
import graft.warehouse.{RunId, Warehouse}

/** The reference's incremental model (SURVEY.md §2.9) generalized to
  * Structured Streaming: a file-source stream over the input directory,
  * `Trigger.AvailableNow` (drain everything, then stop — the streaming
  * equivalent of the reference's batch re-run), and the K2 idempotent
  * anti-join append inside `foreachBatch`. State is the target table
  * itself, so no watermark or state store is needed: re-delivered or
  * duplicate rows collapse against the committed table exactly like
  * `INSERT OR IGNORE`.
  *
  * Also provides the event-time windowed aggregation path with a
  * watermark, for true unbounded streams.
  */
object IncrementalStream {

  private val rawSchema = StructType(Seq(
    StructField("nombre", StringType), StructField("edad", StringType),
    StructField("ciudad", StringType)))

  /** Incremental validating load: every micro-batch runs the same
    * validate -> dimension -> idempotent-append pipeline as the batch
    * path; `run_id` is the micro-batch id.
    */
  def run(spark: SparkSession, warehouse: Warehouse, inputDir: String,
          checkpointDir: String, minAge: Int = 25): StreamingQuery = {
    val stream = spark.readStream
      .option("header", "true")
      .schema(rawSchema)
      .csv(inputDir)

    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val routed = ValidatingTransform(batch, minAge)
        val valid = routed.valid.cache()
        try {
          val runId = s"stream_batch_$batchId"
          val processedAt = RunId.isoNow()
          val dim = warehouse.ensureDimension("ciudades",
            valid.select(col("ciudad").as("nombre")), "nombre", "ciudad_id")
          val withFk = valid
            .join(broadcast(dim.select(col("ciudad_id"), col("nombre").as("ciudad"))),
              Seq("ciudad"))
            .select(col("nombre"), col("edad"), col("ciudad_id"),
              lit(processedAt).as("processed_at"), lit(runId).as("run_id"))
          val stats = warehouse.idempotentAppend("personas_limpias", withFk,
            Seq("nombre", "edad", "ciudad_id"))
          warehouse.appendAudit("etl_runs", runId, processedAt, s"batch_$batchId",
            valid.count(), routed.rejected.count(), stats.inserted, stats.ignored)
        } finally valid.unpersist()
        ()
      }
      .start()
  }

  /** Event-time tumbling-window aggregation over an unbounded event
    * stream, with a watermark bounding state: the streaming form of
    * ReferenceQueries.eventsWindowAgg.
    */
  def windowedEventCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // decimal funnel like the batch form: double addition is not
        // associative, decimal sums are partition-order independent
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 4)))
          .cast("double").as("total_value"))

  /** Streaming exact dedup: the unbounded form of the K2 dedup-on-write
    * primitive. State is bounded by the watermark — a duplicate arriving
    * within the watermark horizon is dropped; later re-deliveries are the
    * idempotent-append anti-join's job (the two compose: in-flight dedup
    * here, committed-table dedup at the sink).
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String], tsCol: String,
                           watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Streaming FUZZY dedup ingestion: every micro-batch is near-dup
    * checked against the corpus committed so far through its persisted
    * minhash state (`Dedup.minhashState` tables under `stateDir`), then
    * the accepted docs and THEIR state are appended — per-batch cost
    * tracks the batch, never the history.
    *
    * Policy: a batch doc near-dup of a committed doc is dropped; within a
    * batch, each near-dup cluster keeps its min-id representative
    * (`Dedup.clusterReps`). Shingle df-caps apply per sub-batch — the
    * side-local cap semantics of the incremental operator.
    */
  def fuzzyDedupIngest(stream: DataFrame, stateDir: String,
                       checkpointDir: String, textCol: String = "text",
                       idCol: String = "doc_id", k: Int = 8,
                       threshold: Double = 0.3): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val sp = batch0.sparkSession
        val hasState = new java.io.File(s"$stateDir/bands/_SUCCESS").exists()
        // exact re-delivery guard first (the K2 idempotent-append move):
        // an id already committed is the SAME doc arriving again — without
        // this it would near-dup itself in the state
        val batch0Ids = batch0.select(col(idCol), col(textCol))
        val batch = (if (hasState)
            batch0Ids.join(sp.read.parquet(s"$stateDir/docs").select(col(idCol)),
              Seq(idCol), "left_anti")
          else batch0Ids).cache()
        try {
          if (!batch.isEmpty) {
            val pairs =
              if (hasState)
                graft.operators.Dedup.minhashLshIncremental(batch,
                  sp.read.parquet(s"$stateDir/bands"),
                  sp.read.parquet(s"$stateDir/shingles"),
                  textCol, idCol, k, threshold)
              else
                graft.operators.Dedup.minhashLsh(batch, textCol, idCol, k, threshold)
            val p = pairs.cache()
            p.count()
            val batchIdsB = batch.select(col(idCol).as("id_b"))
            // id_b outside the batch = a committed corpus doc -> drop id_a
            val corpusHit = p.join(batchIdsB, Seq("id_b"), "left_anti")
              .select(col("id_a").as(idCol))
            val internal = p.join(batchIdsB, Seq("id_b"), "left_semi")
            val internalDrop = graft.operators.Dedup.clusterReps(batch, internal, idCol)
              .filter(col("rep_id") =!= col(idCol)).select(col(idCol))
            val accepted = batch
              .join(corpusHit.union(internalDrop).distinct(), Seq(idCol), "left_anti")
              .cache()
            accepted.count()
            p.unpersist()
            val (bands, shingles) = graft.operators.Dedup.minhashState(
              accepted, textCol, idCol, k)
            bands.write.mode("append").parquet(s"$stateDir/bands")
            // normalize to (id, shingle): dropHotKeys' USING join emits
            // (shingle, id), and the state table is a public contract
            shingles.select(col(idCol), col("shingle"))
              .write.mode("append").parquet(s"$stateDir/shingles")
            accepted.write.mode("append").parquet(s"$stateDir/docs")
            accepted.unpersist()
            ()
          }
        } finally { batch.unpersist(); () }
      }
      .start()
}
