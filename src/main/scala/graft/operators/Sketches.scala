package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.util.sketch.CountMinSketch

/** Frequency sketching: count-min-sketch heavy hitters — the frequency
  * member of the engine's sketch family (HLL++ = distinct counts,
  * Greenwald-Khanna = percentiles, CMS = per-item counts).
  *
  * The exact vocabulary head (`CorpusOps`-style token `groupBy(count)`)
  * shuffles one row per DISTINCT token; at web-corpus scale the token
  * dictionary itself is billions of keys and that shuffle dominates. The
  * sketch path never shuffles the token stream at all:
  *
  *   1. one `count_min_sketch` aggregate per group — partial sketches are
  *      fixed-size (depth×width counters) and merge by cell-wise ADDITION,
  *      so the map-side combine is a handful of KB per task and the result
  *      is partition-order invariant (deterministic for a fixed seed);
  *   2. candidates via per-partition Misra-Gries summaries (`m` counters,
  *      decrement-on-overflow): any token with global count > N/(m+1)
  *      survives in at least one partition's summary, so the union of
  *      survivors (≤ m × partitions rows, ids only) contains every true
  *      heavy hitter;
  *   3. candidates probe the broadcast sketches (CMS never underestimates,
  *      overestimates by ≤ eps·N at the configured confidence) and the
  *      global top-k per group comes off the tiny candidate set.
  *
  * Cf. reference aggregation counters (`scr/etl_project.py:94-99`) scaled
  * past the point where exact per-key counts fit anywhere.
  */
object Sketches {

  /** Top-k most frequent `tokenCol` values per `groupCol`, estimated.
    *
    * @param localCandidates Misra-Gries counter budget per (partition,
    *   group); the candidate recall guarantee covers tokens with count
    *   > N_partition/(localCandidates+1). Raise it for flatter
    *   distributions; memory stays bounded at m counters per group.
    * @param maxGroups PRECONDITION guard: `groupCol` must be
    *   low-cardinality (source, language, shard family — not doc_id).
    *   Driver + broadcast memory is groups × sketch size (~1.1 MB at the
    *   default eps/confidence), so an unbounded group column would OOM
    *   the driver; the collect is capped at `maxGroups + 1` rows and the
    *   call fails fast past the cap rather than accumulating sketches.
    */
  def heavyHitters(df: DataFrame, groupCol: String, tokenCol: String, k: Int,
                   eps: Double = 1e-4, confidence: Double = 0.99, seed: Int = 42,
                   localCandidates: Int = 64, maxGroups: Int = 256): DataFrame = {
    val spark = df.sparkSession
    val toks = df.select(col(groupCol).cast("string").as("g"),
      col(tokenCol).cast("string").as("token"))

    // (1) fixed-memory mergeable sketch per group. The collect is one
    // row per group (the sketch bytes), NOT data-sized — guarded by
    // maxGroups so a high-cardinality groupCol fails fast, not OOM.
    val collected = toks
      .groupBy(col("g"))
      .agg(expr(s"count_min_sketch(token, ${eps}d, ${confidence}d, $seed)").as("cms"))
      .limit(maxGroups + 1)
      .collect()
    require(collected.length <= maxGroups,
      s"heavyHitters: groupCol '$groupCol' has more than $maxGroups distinct values; " +
        "each group costs ~1 MB of driver/broadcast memory — group by a " +
        "low-cardinality column or raise maxGroups deliberately")
    val sketches: Map[String, CountMinSketch] = collected
      .map(r => r.getString(0) -> CountMinSketch.readFrom(r.getAs[Array[Byte]](1)))
      .toMap
    val bSketches = spark.sparkContext.broadcast(
      sketches.map { case (g, s) => g -> s.toByteArray })

    // (2) Misra-Gries per partition: m counters per group, streamed.
    val cand = toks.mapPartitions { it =>
      val mg = mutable.HashMap.empty[String, mutable.HashMap[String, Long]]
      it.foreach { r =>
        val counts = mg.getOrElseUpdate(r.getString(0), mutable.HashMap.empty)
        val tok = r.getString(1)
        counts.get(tok) match {
          case Some(c) => counts(tok) = c + 1
          case None if counts.size < localCandidates => counts(tok) = 1L
          case None => // decrement all; drop zeros (the Misra-Gries step)
            val dead = counts.iterator
              .flatMap { case (t, c) => if (c == 1) Some(t) else None }.toList
            counts.mapValuesInPlace((_, c) => c - 1)
            dead.foreach(counts.remove)
        }
      }
      mg.iterator.flatMap { case (g, counts) =>
        counts.keysIterator.map(t => Row(g, t))
      }
    }(Encoders.row(toks.schema)).distinct()

    // (3) probe the broadcast sketches; top-k off the candidate set. The
    // probe adds the token's UTF-8 bytes exactly as the SQL aggregate did.
    val estimated = cand.mapPartitions { it =>
      val local = bSketches.value.map { case (g, bytes) =>
        g -> CountMinSketch.readFrom(bytes)
      }
      it.flatMap { r =>
        local.get(r.getString(0)).map { s =>
          val tok = r.getString(1)
          Row(r.getString(0), tok,
            s.estimateCount(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }
      }
    }(Encoders.row(org.apache.spark.sql.types.StructType(
      toks.schema.fields :+
        org.apache.spark.sql.types.StructField("n_est",
          org.apache.spark.sql.types.LongType, nullable = false))))

    graft.plans.TopK.perKey(estimated,
        keys = Seq(col("g")),
        orderBy = Seq(col("n_est").desc, col("token").asc),
        k = k)
      .withColumnRenamed("g", groupCol)
  }
}
