package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Trained tokenizers as PERSISTED warehouse artifacts — the engine's
  * "model-sized artifacts are TABLES" principle (already applied to
  * k-means centroids, PQ codebooks, quality weights and decontamination
  * shingle sets) applied to the two tokenizer families. At 100 TB the
  * tokenizer is trained ONCE on a sample and frozen: every later encode
  * / pack / fertility job must reload the exact trained table, never
  * retrain — retraining on a different sample silently changes every
  * token id downstream. This module is the [[AnnIndex]] lifecycle seam
  * for [[Bpe]] and [[UnigramLm]]:
  *
  *   - `dir/model`: the learned table — BPE merges (rank, left, right,
  *     pair_count) or unigram pieces (piece, n, score), all exact
  *     integers/strings, bit-stable through parquet.
  *   - `dir/meta`: one row (family, max_piece_len), written LAST — its
  *     presence is the commit marker, so a build crashed mid-write
  *     leaves an artifact [[load]] refuses cleanly and the next build
  *     overwrites (no partial model can ever be read as trained).
  *
  * Both families encode identically whether the model came from the
  * in-run trainer or a reload (TokenizerArtifactSpec pins encodeIds
  * output and vocabulary bit-for-bit across the persistence boundary).
  */
object TokenizerArtifact {

  /** A frozen tokenizer: the loaded model plus the encode surface. */
  sealed trait Tokenizer {
    def family: String
    def encodeIds(df: DataFrame, textCol: String,
                  idCol: String): (DataFrame, Array[String])
    def encode(df: DataFrame, textCol: String, idCol: String): DataFrame
  }

  final case class BpeTokenizer(merges: Seq[Bpe.Merge]) extends Tokenizer {
    val family = "bpe"
    def encodeIds(df: DataFrame, textCol: String,
                  idCol: String): (DataFrame, Array[String]) =
      Bpe.encodeIds(df, textCol, idCol, merges)
    def encode(df: DataFrame, textCol: String, idCol: String): DataFrame =
      Bpe.encode(df, textCol, idCol, merges)
  }

  final case class UnigramTokenizer(pieces: Seq[UnigramLm.Piece],
                                    maxPieceLen: Int) extends Tokenizer {
    val family = "unigram"
    def encodeIds(df: DataFrame, textCol: String,
                  idCol: String): (DataFrame, Array[String]) =
      UnigramLm.encodeIds(df, textCol, idCol, pieces, maxPieceLen)
    def encode(df: DataFrame, textCol: String, idCol: String): DataFrame =
      UnigramLm.encode(df, textCol, idCol, pieces, maxPieceLen)
  }

  /** Train a BPE tokenizer on `df` and persist it under `dir`. */
  def trainBpe(df: DataFrame, textCol: String, dir: String,
               numMerges: Int = 8): BpeTokenizer = {
    val tok = BpeTokenizer(Bpe.train(df, textCol, numMerges))
    save(df.sparkSession, dir, tok)
    tok
  }

  /** Train a unigram-LM tokenizer on `df` and persist it under `dir`. */
  def trainUnigram(df: DataFrame, textCol: String, dir: String,
                   maxPieceLen: Int = UnigramLm.DefaultMaxPieceLen,
                   seedMulti: Int = 50,
                   keepMulti: Int = 30, iters: Int = 2): UnigramTokenizer = {
    val tok = UnigramTokenizer(
      UnigramLm.train(df, textCol, maxPieceLen, seedMulti, keepMulti, iters),
      maxPieceLen)
    save(df.sparkSession, dir, tok)
    tok
  }

  /** Persist a trained tokenizer: model table first, meta marker last. */
  def save(spark: SparkSession, dir: String, tok: Tokenizer): Unit = {
    import spark.implicits._
    // a rebuild over a half-written artifact must not leave a STALE
    // marker next to a fresh model: drop the marker first
    val metaPath = new org.apache.hadoop.fs.Path(s"$dir/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(metaPath, true)
    tok match {
      case BpeTokenizer(merges) =>
        merges.map(m => (m.rank, m.left, m.right, m.pairCount))
          .toDF("rank", "left", "right", "pair_count")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/model")
        Seq(("bpe", 0)).toDF("family", "max_piece_len")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
      case UnigramTokenizer(pieces, maxPieceLen) =>
        pieces.map(p => (p.piece, p.n, p.score)).toDF("piece", "n", "score")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/model")
        Seq(("unigram", maxPieceLen)).toDF("family", "max_piece_len")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    }
  }

  /** True when `dir` holds a COMMITTED artifact (the meta marker). */
  def exists(spark: SparkSession, dir: String): Boolean = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$dir/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(metaPath)
  }

  /** Reload a frozen tokenizer. The model table is bounded by
    * construction (merges / kept pieces — driver-sized like centroids
    * and codebooks); an uncommitted artifact (no meta marker — a
    * crashed build) fails here with a message naming the rebuild.
    */
  def load(spark: SparkSession, dir: String): Tokenizer = {
    require(exists(spark, dir),
      s"TokenizerArtifact: no committed artifact at $dir (meta marker " +
        "absent — the build crashed or never ran; re-run trainBpe/trainUnigram)")
    val meta = spark.read.parquet(s"$dir/meta").head()
    val model = spark.read.parquet(s"$dir/model")
    meta.getString(0) match {
      case "bpe" =>
        BpeTokenizer(model.select("rank", "left", "right", "pair_count")
          .collect() // bounded: numMerges rows
          .map(r => Bpe.Merge(r.getInt(0), r.getString(1), r.getString(2),
            r.getLong(3)))
          .toSeq.sortBy(_.rank))
      case "unigram" =>
        UnigramTokenizer(
          model.select("piece", "n", "score").collect() // bounded: kept pieces
            .map(r => UnigramLm.Piece(r.getString(0), r.getLong(1), r.getLong(2)))
            .toSeq.sortBy(_.piece),
          meta.getInt(1))
      case other =>
        throw new IllegalStateException(s"unknown tokenizer family: $other")
    }
  }
}
