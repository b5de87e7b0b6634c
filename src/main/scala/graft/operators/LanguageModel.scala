package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame}

/** N-gram language-model quality scoring — the classic LM-based quality
  * filter of LLM data pipelines (CCNet, Wenzek et al. 2020 trains a
  * KenLM on a reference corpus and keeps documents by perplexity; this
  * is the same construction at bigram order, with add-one smoothing, as
  * pure relational algebra).
  *
  * Train = two partial+final hash aggregates over the bigram explode of
  * the REFERENCE corpus (bigram counts + prefix counts + vocab size).
  * Score = join the candidate documents' bigrams against the trained
  * counts (shuffle hash join on the bigram key; the prefix-count join
  * rides the same exchange) and aggregate per-document log-probability.
  * Both sides are linear scans; nothing is collected to the driver, and
  * the counts tables are corpus-vocabulary-sized — persistable and
  * reusable across scoring runs, exactly how a warehouse would ship a
  * trained filter to 1000 executors.
  *
  * Determinism: each bigram's log-probability is a deterministic double;
  * the per-document SUM is funneled through decimal so results are
  * bit-identical under any partitioning.
  */
object LanguageModel {

  /** Consecutive token bigrams per document: (id, w1, w2). Documents with
    * fewer than two tokens contribute no rows. Empty tokens are kept
    * exactly as [[TextAnalysis.tokens]] emits them so train and score
    * tokenize identically (and the SQL oracle can reproduce both).
    */
  def bigrams(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    graft.Tables.fanOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        explode(when(size(toks) < 2, array().cast("array<struct<w1:string,w2:string>>"))
          .otherwise(transform(sequence(lit(0), size(toks) - 2),
            i => struct(element_at(toks, i + 1).as("w1"),
                        element_at(toks, i + 2).as("w2"))))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Train bigram counts on `corpus`: returns (bigram counts (w1, w2, c2),
    * prefix counts (w1, c1), vocab size V = distinct tokens in the
    * corpus). All three are plain DataFrames a warehouse can persist.
    */
  def trainBigram(corpus: DataFrame, textCol: String, idCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val bg = bigrams(corpus, textCol, idCol)
    // materialized: c1 derives from it and the score join reads it again —
    // the bigram-vocabulary table is the small, persistable artifact here
    // (the raw bigram stream is corpus-sized and is deliberately NOT
    // materialized). Eager localCheckpoint, not cache: all three returned
    // frames are lazy views over c2, so no unpersist site exists and the
    // ContextCleaner must be able to reclaim the blocks.
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    // prefix counts roll up from the aggregated table, not a second pass
    // over the corpus: c1(w1) = Σ_w2 c2(w1,w2) exactly
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
    // vocab over the full token stream, WITHOUT a second corpus-wide
    // explode+distinct: every token of a ≥2-token document appears in
    // some bigram as prefix or suffix, so V = distinct(w1 ∪ w2 ∪ tokens
    // of exactly-one-token documents). The first two legs read the
    // cached, vocabulary-sized c2; the third scans the corpus but only
    // ships the (rare) single-token docs' tokens into the distinct —
    // semantics identical to the full-stream count (oracle unchanged)
    val toks = TextAnalysis.tokens(col(textCol))
    val vocab = c2.select(col("w1").as("w"))
      .union(c2.select(col("w2").as("w")))
      .union(corpus.select(col(textCol)).filter(size(toks) === 1)
        .select(element_at(toks, 1).as("w")))
      .agg(count_distinct(col("w")).as("v"))
    (c2, c1, vocab)
  }

  /** Greedy next-token table: for the `k` most frequent contexts w1
    * (ties to the smallest token), the argmax continuation w2 with its
    * conditional probability — the inspection surface of the bigram LM
    * ("what does the model actually predict"), and the 1-step greedy
    * decoder over it. Everything derives from [[trainBigram]]'s
    * vocabulary-sized c2/c1 tables: the per-context argmax window runs
    * over c2 (never the corpus), the context top-k plans as a bounded
    * TakeOrderedAndProject, and p = c2/c1 is one exact-integer division
    * per emitted row.
    */
  def nextTokenTopK(corpus: DataFrame, textCol: String, idCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (c2, c1, _) = trainBigram(corpus, textCol, idCol)
    val topCtx = c1.orderBy(col("c1").desc, col("w1")).limit(k)
    val w = Window.partitionBy("w1").orderBy(col("c2").desc, col("w2"))
    val best = c2.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    topCtx.join(best, "w1")
      .select(col("w1"), col("c1").as("n_ctx"), col("w2").as("next_tok"),
        col("c2").as("n_pair"),
        round(col("c2").cast("double") / col("c1").cast("double"), 6)
          .as("p_next"))
  }

  /** Pointwise-mutual-information collocations: the top-k adjacent word
    * pairs by PMI = ln(c(w1,w2)·N / (c(w1)·c(w2))) among pairs seen at
    * least `minCount` times — the collocation extractor a corpus analyst
    * runs before building tokenizers or phrase tables. All inputs come
    * from the one bigram aggregate ([[trainBigram]]'s c2 plus a suffix
    * rollup); N is a bounded 1-row collect; the global top-k plans as
    * TakeOrderedAndProject. PMI rounds to 6 dp (cross-engine libm `ln`),
    * ties break lexicographically.
    */
  def pmiTopK(corpus: DataFrame, textCol: String, idCol: String,
              minCount: Long, k: Int): DataFrame = {
    val (c2, c1, _) = trainBigram(corpus, textCol, idCol)
    val c1r = c2.groupBy("w2").agg(sum("c2").as("c1r"))
    val n = c2.agg(sum(col("c2"))).head().getLong(0) // bounded: one scalar
    c2.filter(col("c2") >= minCount)
      .join(c1, Seq("w1")).join(c1r, Seq("w2"))
      .select(col("w1"), col("w2"), col("c2"),
        round(log(col("c2").cast("double") * n /
          (col("c1").cast("double") * col("c1r"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Consecutive token trigrams per document: (id, w1, w2, w3). */
  def trigrams(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    graft.Tables.fanOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        explode(when(size(toks) < 3,
            array().cast("array<struct<w1:string,w2:string,w3:string>>"))
          .otherwise(transform(sequence(lit(0), size(toks) - 3),
            i => struct(element_at(toks, i + 1).as("w1"),
                        element_at(toks, i + 2).as("w2"),
                        element_at(toks, i + 3).as("w3"))))).as("tg"))
      .select(col(idCol), col("tg.w1").as("w1"), col("tg.w2").as("w2"),
        col("tg.w3").as("w3"))
  }

  /** TRIGRAM language model with STUPID BACKOFF (Brants et al. 2007,
    * "Large Language Models in Machine Translation") — the web-scale
    * smoothing built for exactly this engine's regime: no discounting,
    * no normalization, just count ratios with a fixed backoff factor,
    * which is why it trains on trillions of tokens where KN's
    * type-count bookkeeping becomes the bottleneck. Per scored trigram
    * (α = 0.4, the paper's constant):
    *
    *   S(w3|w1w2) = c3/c2(w1,w2)            if c3 > 0
    *              = α · c2(w2,w3)/c1(w2)    else if c2(w2,w3) > 0
    *              = α² · c1(w3)/N           else if c1(w3) > 0
    *              = α² / N                  else (OOV floor)
    *
    * S is a SCORE, not a probability (the paper's point) — the
    * "perplexity" column is exp of the mean negative log score, the
    * same monotone quality signal. Training is three partial-
    * aggregatable count tables (trigram/bigram/unigram) off ONE pinned
    * token-array pass; scoring joins the candidate trigram stream
    * against the vocabulary-sized tables (c3 is trigram-TYPE-sized —
    * large at corpus scale but partial-aggregated and persistable, the
    * same artifact shape KenLM ships). Same rounding contract as the
    * bigram scorers.
    */
  def scoreTrigramStupidBackoff(train: DataFrame, score: DataFrame,
                                textCol: String, idCol: String,
                                alpha: Double = 0.4): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, "alpha in (0, 1)")
    val toks = TextAnalysis.tokens(col(textCol))
    // one corpus pass pins the token arrays; all three count tables
    // derive from it (eager localCheckpoint — lazy consumers, no
    // unpersist site, ContextCleaner reclaims)
    val arrs = graft.Tables.fanOut(train.select(col(idCol), col(textCol)))
      .select(col(idCol), toks.as("w")).localCheckpoint(true)
    val uni = arrs.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c1"))
      .localCheckpoint(true) // N derives from it; scoring reads it twice
    val bi = arrs
      .select(explode(when(size(col("w")) < 2,
          array().cast("array<struct<a:string,b:string>>"))
        .otherwise(transform(sequence(lit(0), size(col("w")) - 2),
          i => struct(element_at(col("w"), i + 1).as("a"),
                      element_at(col("w"), i + 2).as("b"))))).as("bg"))
      .groupBy(col("bg.a").as("a"), col("bg.b").as("b"))
      .agg(count(lit(1)).as("c2"))
      .localCheckpoint(true) // joined twice (context and backoff legs)
    val tri = arrs
      .select(explode(when(size(col("w")) < 3,
          array().cast("array<struct<a:string,b:string,c:string>>"))
        .otherwise(transform(sequence(lit(0), size(col("w")) - 3),
          i => struct(element_at(col("w"), i + 1).as("a"),
                      element_at(col("w"), i + 2).as("b"),
                      element_at(col("w"), i + 3).as("c"))))).as("tg"))
      .groupBy(col("tg.a").as("a"), col("tg.b").as("b"), col("tg.c").as("c"))
      .agg(count(lit(1)).as("c3"))
    val n = uni.agg(sum(col("c1"))).head().getLong(0) // bounded: one scalar
    val al = lit(alpha)
    val sb = trigrams(score, textCol, idCol)
      .join(tri.select(col("a").as("w1"), col("b").as("w2"), col("c").as("w3"),
        col("c3")), Seq("w1", "w2", "w3"), "left")
      .join(bi.select(col("a").as("w1"), col("b").as("w2"), col("c2").as("c2ctx")),
        Seq("w1", "w2"), "left")
      .join(bi.select(col("a").as("w2"), col("b").as("w3"), col("c2").as("c2bak")),
        Seq("w2", "w3"), "left")
      .join(uni.select(col("t").as("w2"), col("c1").as("c1mid")), Seq("w2"), "left")
      .join(uni.select(col("t").as("w3"), col("c1").as("c1last")), Seq("w3"), "left")
      .withColumn("s",
        when(col("c3").isNotNull,
          col("c3").cast("double") / col("c2ctx").cast("double"))
        .otherwise(when(col("c2bak").isNotNull,
          al * (col("c2bak").cast("double") / col("c1mid").cast("double")))
        .otherwise(when(col("c1last").isNotNull,
          al * al * (col("c1last").cast("double") / lit(n.toDouble)))
        .otherwise(al * al / lit(n.toDouble)))))
      .withColumn("lp", log(col("s")))
    sb.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        (-sum(col("lp").cast(DecimalType(38, 12))).cast("double") /
          count(lit(1))).as("nll"))
      .select(col(idCol), col("n_trigrams"),
        round(col("nll"), 6).as("avg_nll"),
        round(exp(col("nll")), 4).as("perplexity"))
  }

  /** Score `docs` with INTERPOLATED KNESER-NEY smoothing (Kneser & Ney
    * 1995, in the Chen & Goodman 1998 interpolated form at bigram order,
    * fixed discount D) — the smoothing real LM-quality filters actually
    * use: add-one treats every unseen bigram alike, KN backs off to how
    * PROMISCUOUSLY a word continues contexts (the "San Francisco"
    * effect: "francisco" is frequent but follows almost nothing, so its
    * continuation probability is tiny).
    *
    *   seen prefix:   p(w2|w1) = max(c2−D, 0)/c1 + D·n1p(w1)/c1 · pcont(w2)
    *   unseen prefix: p(w2|w1) = pcont(w2)
    *   pcont(w2) = (n1c(w2) + 1) / (T + V + 1)
    *
    * n1p(w1) = distinct continuations of w1, n1c(w2) = distinct contexts
    * preceding w2, T = distinct bigram types; the continuation
    * distribution is Laplace-smoothed over V+1 outcomes so OOV suffixes
    * get positive mass (and the discount identity Σ max(c2−D,0)/c1 =
    * 1 − D·n1p/c1 keeps each context's mass ≈1 over the extended
    * vocabulary). EVERYTHING derives from the one cached bigram
    * aggregate — n1p/n1c/T are vocabulary-sized rollups of c2, never a
    * corpus pass; T and V are bounded 1-row collects; the score join
    * rides the same shuffle shape as [[scoreBigram]]. Output columns
    * identical to scoreBigram (same rounding contract).
    */
  def scoreBigramKN(docs: DataFrame, textCol: String, idCol: String,
                    c2: DataFrame, c1: DataFrame, vocab: DataFrame,
                    discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0, "discount in (0, 1)")
    val v = vocab.head().getLong(0)
    val t = c2.agg(count(lit(1))).head().getLong(0) // bounded: one scalar
    val n1p = c2.groupBy("w1").agg(count(lit(1)).as("n1p"))
    val n1c = c2.groupBy("w2").agg(count(lit(1)).as("n1c"))
    val d = lit(discount)
    bigrams(docs, textCol, idCol)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .join(n1p, Seq("w1"), "left")
      .join(n1c, Seq("w2"), "left")
      .withColumn("pcont",
        (coalesce(col("n1c"), lit(0L)) + lit(1.0)) / lit(t + v + 1.0))
      .withColumn("lp", log(
        when(col("c1").isNull, col("pcont"))
          .otherwise(
            greatest(coalesce(col("c2"), lit(0L)) - d, lit(0.0)) / col("c1") +
              d * col("n1p") / col("c1") * col("pcont"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (-sum(col("lp").cast(DecimalType(38, 12))).cast("double") /
          count(lit(1))).as("nll"))
      .select(col(idCol), col("n_bigrams"),
        round(col("nll"), 6).as("avg_nll"),
        round(exp(col("nll")), 4).as("perplexity"))
  }

  /** Score `docs` against trained counts with add-one (Laplace) smoothing:
    * p(w2|w1) = (c2 + 1) / (c1 + V), with c2 = 0 for unseen bigrams and
    * c1 = 0 for unseen prefixes. Returns one row per document that has at
    * least one bigram: (id, n_bigrams, avg_nll = −Σ ln p / n, perplexity
    * = exp(avg_nll)). avg_nll rounds to 6 decimals; perplexity to 4 —
    * exp() amplifies last-ulp libm differences by the perplexity's own
    * magnitude (thousands), so the coarser grid keeps the rounding
    * engine-independent.
    */
  def scoreBigram(docs: DataFrame, textCol: String, idCol: String,
                  c2: DataFrame, c1: DataFrame, vocab: DataFrame): DataFrame = {
    // V: uncorrelated scalar subquery — evaluated once, injected as a
    // literal (bounded 1-row collect, cf. Similarity.pivotLiteral)
    val v = vocab.head().getLong(0)
    val bg = bigrams(docs, textCol, idCol)
    bg.join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .withColumn("lp",
        log((coalesce(col("c2"), lit(0L)) + 1.0) /
            (coalesce(col("c1"), lit(0L)) + lit(v))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (-sum(col("lp").cast(DecimalType(38, 12))).cast("double") /
          count(lit(1))).as("nll"))
      .select(col(idCol), col("n_bigrams"),
        round(col("nll"), 6).as("avg_nll"),
        round(exp(col("nll")), 4).as("perplexity"))
  }
}
