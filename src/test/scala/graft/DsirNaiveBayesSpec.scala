package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dsir, NaiveBayes}

/** Semantic pins for the round-4 selection/classification operators —
  * the oracle proves cell-exactness; these prove the operators LEARN
  * (selection shifts the distribution toward the target, the classifier
  * beats priors) and stay deterministic under re-partitioning.
  */
class DsirNaiveBayesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private def docs = Tables.load(spark, sf, "documents")

  /** The harness documents fixture draws every language's text from ONE
    * shared vocabulary (verified: per-lang token distributions are
    * identical), so learning assertions need constructed corpora with
    * actual signal; the fixture-based oracle checks still prove
    * cell-exactness of the arithmetic.
    */
  private def styledCorpus(n: Int) = {
    import spark.implicits._
    // two disjoint vocabularies: "code" docs vs "news" docs
    val code = Seq("parser", "compiler", "bytecode", "heap", "stack", "lambda")
    val news = Seq("election", "minister", "economy", "treaty", "senate", "budget")
    (0L until n.toLong).map { i =>
      // style alternates in blocks of 4 so the doc_id % 4 == 0 train
      // split sees both classes (a parity-based style would correlate
      // with the split and starve training of one label)
      val style = if (i % 8 < 4) "code" else "news"
      val vocab = if (style == "code") code else news
      val words = (0 until 12).map(j => vocab(((i + j * 7) % vocab.size).toInt))
      (i, words.mkString(" "), style)
    }.toDF("doc_id", "text", "style")
  }

  test("DSIR selection shifts composition toward the target distribution") {
    val d = styledCorpus(400)
    val sel = Dsir.select(d, d.filter(col("style") === "code"),
      "doc_id", "text", buckets = 256, k = 100)
    val selRows = sel.join(d.select("doc_id", "style"), "doc_id").collect()
    assert(selRows.length == 100)
    val selCode = selRows.count(_.getAs[String]("style") == "code") / 100.0
    // corpus is 50/50; resampling toward "code" must overrepresent it hard
    assert(selCode > 0.9,
      s"selected code share $selCode vs corpus 0.5 — selection isn't selecting")
  }

  test("DSIR selection is invariant under re-partitioning") {
    val d = docs
    val tgt = d.filter(col("lang") === "en")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dsir.select(df, tgt, "doc_id", "text", buckets = 1024, k = 150)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(run(d) == run(d.repartition(13)))
  }

  test("Naive Bayes learns a separable concept on held-out docs") {
    val d = styledCorpus(400)
    val model = NaiveBayes.train(d.filter(col("doc_id") % 4 === 0),
      "doc_id", "text", "style", buckets = 512)
    val heldOut = d.filter(col("doc_id") % 4 =!= 0)
    val pred = NaiveBayes.classify(heldOut, model, "doc_id", "text", buckets = 512)
      .join(heldOut.select("doc_id", "style"), "doc_id")
    val n = pred.count().toDouble
    val correct = pred.filter(col("pred_label") === col("style")).count() / n
    assert(correct > 0.95, s"held-out accuracy $correct on a separable concept")
  }

  test("Naive Bayes on the signal-free fixture degrades to the prior, deterministically") {
    val d = docs
    val model = NaiveBayes.train(d.filter(col("doc_id") % 4 === 0),
      "doc_id", "text", "lang", buckets = 512)
    def run(df: org.apache.spark.sql.DataFrame) =
      NaiveBayes.classify(df, model, "doc_id", "text", buckets = 512)
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val a = run(d)
    assert(a.nonEmpty && a == run(d.repartition(11)))
  }

  test("Naive Bayes model is a complete smoothed grid") {
    val d = docs
    val model = NaiveBayes.train(d.filter(col("doc_id") % 4 === 0),
      "doc_id", "text", "lang", buckets = 64)
    val labels = d.filter(col("doc_id") % 4 === 0)
      .select("lang").distinct().count()
    assert(model.count() == labels * 64)
    assert(model.filter(col("log_lik").isNull || col("log_lik") >= 0).count() == 0)
  }
}
