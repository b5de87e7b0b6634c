package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Byte-pair-encoding merge training over a corpus — the tokenizer-
  * training member of the pipeline (cf. the reference's per-column
  * normalization counters, `scr/etl_project.py:94-99`, scaled to subword
  * statistics).
  *
  * Distributed shape: the weighted symbol table (one row per DISTINCT
  * word, with its corpus frequency as weight) stays partitioned across
  * the cluster for the whole training loop. Each merge iteration is
  *
  *   1. adjacent-pair explode → `groupBy(pair).agg(sum(weight))` — a
  *      partial+final HashAggregate, so the shuffle carries one row per
  *      distinct pair per task, not one per occurrence;
  *   2. a 1-ROW collect of the argmax pair (weight desc, pair asc — the
  *      deterministic tie-break), which is the only data that ever
  *      reaches the driver;
  *   3. a map-only pass rewriting each symbol array (left-to-right,
  *      non-overlapping — the standard BPE scan).
  *
  * At 100 TB the distinct-word table is billions of rows; nothing here
  * collects it, sorts it globally, or assumes it fits anywhere. The plain
  * in-memory formulation (every tokenizer library) IS the oracle: BpeSpec
  * pins the distributed merge sequence against a local reference
  * implementation word-for-word.
  */
object Bpe {

  /** End-of-word sentinel appended to each word's symbol sequence, so
    * merges never cross word boundaries and word-final units stay
    * distinct from word-internal ones (the original BPE formulation).
    */
  val EndOfWord = "</w>"

  // public: the Dataset encoder's generated code instantiates it reflectively
  case class WordSyms(syms: Seq[String], w: Long)

  /** One learned merge: `rank`-th most frequent adjacent pair at the time
    * it was merged, with its weighted count.
    */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** Learn `numMerges` merges from whitespace-tokenized `textCol`.
    * Deterministic: ties break lexicographically on (left, right).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    val spark = df.sparkSession
    import spark.implicits._

    // one pass builds the weighted vocabulary; training never rereads the
    // corpus. chars → symbol seq + end-of-word sentinel.
    //
    // Lineage discipline: every generation is localCheckpoint'ed (eager) —
    // the iterative rewrite otherwise stacks one InMemoryRelation inside
    // the next and the plan tree grows EXPONENTIALLY with merge count
    // (generation N's plan prints N-1's twice). The checkpoint flattens
    // each generation to a LogicalRDD, so plan depth — and every explain/
    // codegen cost — stays constant across iterations. Blocks of dropped
    // generations are reclaimed by the ContextCleaner once unreferenced;
    // on a real cluster with a long merge schedule you would swap in
    // reliable checkpointing (sc.setCheckpointDir + .checkpoint) at an
    // interval.
    var vocab: Dataset[WordSyms] = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("w"))
      .as[(String, Long)]
      .map { case (word, w) => WordSyms(word.map(_.toString) :+ EndOfWord, w) }
      .localCheckpoint(eager = false)

    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // (1) weighted adjacent-pair counts: explode is flatMap-shaped (no
      // array build per row beyond the pair stream), agg combines map-side.
      val top = vocab.flatMap { ws =>
          val s = ws.syms
          Iterator.range(0, s.length - 1).map(i => (s(i), s(i + 1), ws.w))
        }.toDF("left", "right", "w")
        .groupBy("left", "right").agg(sum("w").as("pw"))
        .orderBy(desc("pw"), asc("left"), asc("right"))
        .limit(1) // (2) the only driver-bound data: one row
        .collect()
      if (top.isEmpty) done = true
      else {
        val row = top(0)
        val (a, b, pw) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += Merge(rank, a, b, pw)
        // (3) map-only rewrite. LAZY checkpoint: the next iteration's
        // pair-count job materializes the new generation as a side
        // effect, so each merge costs ONE job, not a materialize+agg
        // pair; lineage is cut identically (see discipline note above).
        vocab = vocab.map(ws => WordSyms(mergePair(ws.syms, a, b), ws.w))
          .localCheckpoint(eager = false)
        rank += 1
      }
    }
    merges.result()
  }

  /** Encode-side tokenization, mirroring the training pass EXACTLY
    * ([[TextAnalysis.tokens]] = `split(lower(trim(text)), " ")` + drop
    * empties): locale-independent lowercase (a tr_TR JVM default would
    * map 'I'→'ı' and diverge from Spark's `lower()`), split on the space
    * character only (Java `trim` would also strip tab/newline edges the
    * training tokenizer keeps inside tokens; space-trim itself is a
    * no-op under the empty-token filter).
    */
  private def tokenize(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT).split(" ").filter(_.nonEmpty)

  /** The standard BPE merge scan: replace adjacent (a,b) left-to-right,
    * non-overlapping.
    */
  def mergePair(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i < n - 1 && syms(i) == a && syms(i + 1) == b) { out += (a + b); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learned merge table as a DataFrame (the `corpus_bpe` query shape). */
  def trainTable(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, textCol, numMerges)
      .map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Encode: apply a learned merge list (in rank order) to every doc —
    * map-only with the merges broadcast as a literal list; emits subword
    * statistics per doc. The per-word merge loop runs over the broadcast
    * list exactly like every tokenizer runtime.
    */
  /** Encode to TOKEN ID SEQUENCES — the artifact a training run reads.
    * Two map-only passes over a cached symbol encoding: the first
    * derives the vocabulary (distinct final symbols — bounded by
    * alphabet + merges, a driver-sized collect), the second maps
    * symbols to ids. Vocabulary ids are sorted-symbol order:
    * deterministic under any partitioning and stable across runs with
    * the same merges. Returns (doc_id, token_ids) plus the vocabulary.
    */
  def encodeIds(df: DataFrame, textCol: String, idCol: String,
                merges: Seq[Merge]): (DataFrame, Array[String]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val ordered = merges.sortBy(_.rank).map(m => (m.left, m.right))
    val bMerges = spark.sparkContext.broadcast(ordered)
    val syms = df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val words = tokenize(text)
        val out = Seq.newBuilder[String]
        words.foreach { word =>
          var s: Seq[String] = word.map(_.toString) :+ EndOfWord
          bMerges.value.foreach { case (a, b) => s = mergePair(s, a, b) }
          out ++= s
        }
        (id, out.result())
      }
      .toDF("id", "syms")
      // eager localCheckpoint, not cache: the returned ids frame is a lazy
      // view over syms, so no unpersist site exists; checkpoint blocks are
      // ContextCleaner-reclaimed once the caller drops the result
      .localCheckpoint(true)
    val vocab = syms.select(explode(col("syms")).as("s")).distinct()
      .collect().map(_.getString(0)).sorted // bounded: alphabet + merges
    val bIdx = spark.sparkContext.broadcast(vocab.zipWithIndex.toMap)
    val ids = syms.as[(Long, Seq[String])]
      .map { case (id, ss) => (id, ss.map(bIdx.value)) }
      .toDF(idCol, "token_ids")
    (ids, vocab)
  }

  def encode(df: DataFrame, textCol: String, idCol: String,
             merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ordered = merges.sortBy(_.rank).map(m => (m.left, m.right))
    val bMerges = spark.sparkContext.broadcast(ordered)
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val words = tokenize(text)
        var nSub = 0L
        words.foreach { word =>
          var syms: Seq[String] = word.map(_.toString) :+ EndOfWord
          bMerges.value.foreach { case (a, b) => syms = mergePair(syms, a, b) }
          nSub += syms.length
        }
        (id, words.length.toLong, nSub)
      }
      .toDF(idCol, "n_words", "n_subwords")
  }
}
