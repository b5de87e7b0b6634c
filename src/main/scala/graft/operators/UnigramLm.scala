package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Unigram-LM (SentencePiece-style) subword tokenizer — the OTHER
  * dominant tokenizer family next to [[Bpe]] (Kudo 2018, "Subword
  * Regularization"; several frontier tokenizers are unigram-based).
  * Training is Viterbi-EM (hard EM): seed a candidate vocabulary from
  * weighted substring counts, then alternate (E) Viterbi-best
  * segmentation of every distinct word under the current piece scores
  * with (M) re-estimating scores from the segmentation counts, pruning
  * to a fixed multi-char budget each round. Single-character pieces are
  * never pruned (Kudo's character-coverage guarantee), so every word
  * always has at least one segmentation.
  *
  * Determinism contract (the whole point of the formulation): piece
  * scores are FIXED-POINT log-probabilities — `floor(ln((n+1)/(T+K)) ·
  * 2²⁰)` as a Long — so the Viterbi DP compares exact integers, never
  * doubles, and the argmax at every position is bit-reproducible across
  * partitionings, JVMs, and the DuckDB oracle (the same discipline as
  * the PQ codebook and trained-quality oracles). Ties break (score
  * desc, piece-count asc, start-position asc — i.e. longer final piece
  * first), pruning ties break (count desc, piece asc).
  *
  * Distributed shape (the [[Bpe.train]] discipline): the distinct-word
  * table is built once (one corpus pass) and stays partitioned across
  * the cluster; each EM round is ONE map-only Viterbi pass under the
  * broadcast piece table plus ONE partial-aggregated shuffle of piece
  * counts, and the only driver-bound data is the piece table itself —
  * bounded by alphabet + seedMulti by construction. At 100 TB the
  * distinct-word table is billions of rows; nothing here collects it.
  *
  * Cf. the reference's per-column normalization counters
  * (`scr/etl_project.py:94-99`) scaled to subword statistics — same
  * role as [[Bpe]], different public algorithm.
  */
object UnigramLm {

  /** Fixed-point scale: scores are floor(ln(p) · 2²⁰). */
  val FxScale: Long = 1L << 20

  /** Score of an out-of-vocabulary single character at encode time
    * (−100 nats in fixed point — SentencePiece's large-UNK-penalty
    * shape). Unreachable during training: every training-corpus char is
    * a seed piece and chars are never pruned.
    */
  val UnkScore: Long = -100L * FxScale

  /** Words longer than this are excluded from training and fall back to
    * per-character segmentation at encode time (bounds the DP unroll of
    * the SQL oracle; natural-language words virtually never exceed it —
    * a fixture guard in UnigramLmSpec pins that the test corpora never
    * hit the fallback, so the oracle replay is exact).
    */
  val MaxWordLen = 12

  /** The one source of truth for the default Viterbi piece-length
    * window: train and every encode path MUST use the same value, or
    * segmentations silently diverge between them.
    */
  val DefaultMaxPieceLen = 6

  final case class Piece(piece: String, n: Long, score: Long)

  private[graft] def fxLn(num: Long, den: Long): Long =
    math.floor(math.log(num.toDouble / den.toDouble) * FxScale).toLong

  /** M-step scoring: Laplace-smoothed fixed-point log-probs over the
    * kept pieces — `floor(ln((n+1)/(T+K)) · 2²⁰)`, T = Σn, K = |pieces|.
    */
  private def rescore(kept: Seq[(String, Long)]): Seq[Piece] = {
    val t = kept.map(_._2).sum
    val k = kept.size
    kept.map { case (p, n) => Piece(p, n, fxLn(n + 1, t + k)) }
  }

  /** Viterbi-best segmentation of one word under `scores` (+ UNK char
    * fallback). DP over prefix lengths with exact-integer comparisons;
    * tie-break (score desc, piece-count asc, start asc). Always
    * succeeds: a single char is either a piece or UNK.
    */
  def segment(word: String, scores: collection.Map[String, Long],
              maxPieceLen: Int): Seq[String] = {
    val l = word.length
    if (l == 0) return Nil
    if (l > MaxWordLen) return word.map(_.toString) // char fallback
    val score = new Array[Long](l + 1)
    val np = new Array[Int](l + 1)
    val back = new Array[Int](l + 1) // chosen piece's 1-based start
    var k = 1
    while (k <= l) {
      var bs = Long.MinValue
      var bn = 0
      var bp = 0
      var s = math.max(1, k - maxPieceLen + 1)
      while (s <= k) {
        val sub = word.substring(s - 1, k)
        val ps = scores.get(sub) match {
          case Some(x) => x
          case None => if (s == k) UnkScore else Long.MinValue
        }
        if (ps != Long.MinValue) {
          val cs = score(s - 1) + ps
          val cn = np(s - 1) + 1
          // first-wins on full tie == start-position-asc tie-break
          if (cs > bs || (cs == bs && cn < bn)) { bs = cs; bn = cn; bp = s }
        }
        s += 1
      }
      score(k) = bs; np(k) = bn; back(k) = bp
      k += 1
    }
    var pos = l
    var seg = List.empty[String]
    while (pos > 0) {
      val s = back(pos)
      seg ::= word.substring(s - 1, pos)
      pos = s - 1
    }
    seg
  }

  /** The weighted distinct-word table ([[Bpe]]'s tokenization contract:
    * split(lower(trim(text)), " "), drop empties), long words excluded.
    */
  private def wordTable(df: DataFrame, textCol: String): Dataset[(String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0 && length(col("word")) <= MaxWordLen)
      .groupBy("word").agg(count(lit(1)).as("w"))
      .as[(String, Long)]
  }

  /** Train the piece table. One corpus pass builds the weighted word
    * table (eagerly pinned — every round rereads it, never the corpus);
    * then `iters` Viterbi-EM rounds as described in the object doc.
    * Returns pieces sorted by piece (the deterministic output order).
    */
  def train(df: DataFrame, textCol: String, maxPieceLen: Int = DefaultMaxPieceLen,
            seedMulti: Int = 50, keepMulti: Int = 30,
            iters: Int = 2): Seq[Piece] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(maxPieceLen >= 2 && maxPieceLen <= MaxWordLen, "maxPieceLen in [2, MaxWordLen]")
    require(keepMulti <= seedMulti, "keepMulti <= seedMulti (pruning only shrinks)")

    val words = wordTable(df, textCol).localCheckpoint(true)

    // seed: weighted counts of every substring of length 1..maxPieceLen
    // (per OCCURRENCE — a repeated substring within a word counts each
    // time). ALL single chars + top-seedMulti multi-char.
    val subCnt = words.flatMap { case (word, w) =>
        val l = word.length
        for { s <- 1 to l; e <- s until math.min(s + maxPieceLen, l + 1) }
          yield (word.substring(s - 1, e), w)
      }.toDF("piece", "w")
      .groupBy("piece").agg(sum("w").as("n"))
      .localCheckpoint(true) // two bounded collects below read it
    val chars = subCnt.filter(length(col("piece")) === 1)
      .as[(String, Long)].collect() // bounded: the alphabet
    val multi = subCnt.filter(length(col("piece")) >= 2)
      .orderBy(desc("n"), asc("piece")).limit(seedMulti)
      .as[(String, Long)].collect() // bounded: seedMulti
    var pieces = rescore((chars ++ multi).toSeq.sortBy(_._1))

    var round = 0
    while (round < iters) {
      val bScores = spark.sparkContext.broadcast(
        pieces.map(p => p.piece -> p.score).toMap)
      // E-step: one map-only pass + one partial-aggregated shuffle; the
      // result is piece-table-sized (segments only emit known pieces),
      // so the collect is bounded by alphabet + seedMulti
      val cnt = words.flatMap { case (word, w) =>
          segment(word, bScores.value, maxPieceLen).map(p => (p, w))
        }.toDF("piece", "w")
        .groupBy("piece").agg(sum("w").as("n"))
        .as[(String, Long)].collect().toMap
      // M-step + prune: chars always kept (with their new counts, 0 if
      // unused); multi-char pruned to the keepMulti budget, zero-count
      // multi dropped — ties (count desc, piece asc)
      val keptChars = pieces.collect {
        case Piece(p, _, _) if p.length == 1 => p -> cnt.getOrElse(p, 0L)
      }
      val keptMulti = cnt.toSeq
        .filter { case (p, n) => p.length >= 2 && n > 0 }
        .sortBy { case (p, n) => (-n, p) }.take(keepMulti)
      pieces = rescore((keptChars ++ keptMulti).sortBy(_._1))
      round += 1
    }
    pieces.sortBy(_.piece)
  }

  /** Learned piece table as a DataFrame — the `corpus_unigram_lm` query
    * shape: (piece, n, score), all exact integers/strings.
    */
  def trainTable(df: DataFrame, textCol: String, maxPieceLen: Int = DefaultMaxPieceLen,
                 seedMulti: Int = 50, keepMulti: Int = 30,
                 iters: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, textCol, maxPieceLen, seedMulti, keepMulti, iters)
      .map(p => (p.piece, p.n, p.score)).toDF("piece", "n", "score")
  }

  /** Encode to TOKEN ID SEQUENCES — the artifact a training run reads
    * ([[Bpe.encodeIds]]'s unigram twin). Two map-only passes over a
    * pinned segment encoding: the first derives the vocabulary
    * (distinct emitted pieces — the trained pieces that actually occur,
    * plus any UNK-fallback chars the training sample never saw; bounded
    * by pieces + alphabet, a driver-sized collect), the second maps
    * pieces to ids. Ids are sorted-piece order: deterministic under any
    * partitioning. Returns (idCol, token_ids) plus the vocabulary.
    */
  def encodeIds(df: DataFrame, textCol: String, idCol: String,
                pieces: Seq[Piece], maxPieceLen: Int = DefaultMaxPieceLen): (DataFrame, Array[String]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val bScores = spark.sparkContext.broadcast(
      pieces.map(p => p.piece -> p.score).toMap)
    val segs = df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val memo = collection.mutable.HashMap.empty[String, Seq[String]]
        rows.map { case (id, text) =>
          val words = Option(text).getOrElse("")
            .toLowerCase(java.util.Locale.ROOT).split(" ").filter(_.nonEmpty)
          val out = Seq.newBuilder[String]
          words.foreach { w =>
            out ++= memo.getOrElseUpdate(w, segment(w, bScores.value, maxPieceLen))
          }
          (id, out.result())
        }
      }
      .toDF("id", "segs")
      // eager localCheckpoint, not cache: the returned ids frame is a
      // lazy view over segs, so no unpersist site exists (Bpe.encodeIds'
      // discipline)
      .localCheckpoint(true)
    val vocab = segs.select(explode(col("segs")).as("p")).distinct()
      .collect().map(_.getString(0)).sorted // bounded: pieces + alphabet
    val bIdx = spark.sparkContext.broadcast(vocab.zipWithIndex.toMap)
    val ids = segs.as[(Long, Seq[String])]
      .map { case (id, ss) => (id, ss.map(bIdx.value)) }
      .toDF(idCol, "token_ids")
    (ids, vocab)
  }

  /** Encode: per-doc (n_words, n_pieces) under a trained piece table —
    * map-only with the scores broadcast, a per-partition memo so each
    * distinct word per task runs Viterbi once. Mirrors [[Bpe.encode]]'s
    * query surface.
    */
  def encode(df: DataFrame, textCol: String, idCol: String,
             pieces: Seq[Piece], maxPieceLen: Int = DefaultMaxPieceLen): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bScores = spark.sparkContext.broadcast(
      pieces.map(p => p.piece -> p.score).toMap)
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val memo = collection.mutable.HashMap.empty[String, Int]
        rows.map { case (id, text) =>
          val words = Option(text).getOrElse("")
            .toLowerCase(java.util.Locale.ROOT).split(" ").filter(_.nonEmpty)
          var nPieces = 0L
          words.foreach { w =>
            nPieces += memo.getOrElseUpdate(w,
              segment(w, bScores.value, maxPieceLen).length)
          }
          (id, words.length.toLong, nPieces)
        }
      }
      .toDF(idCol, "n_words", "n_pieces")
  }
}
