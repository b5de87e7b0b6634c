package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID (stopword-lexicon heuristic), quality scoring, token
  * counting, and document fingerprinting. All are single-pass, codegen'd
  * column expressions — map-only stages at 100 TB (no shuffle, no UDF).
  *
  * Tokenization is single-space split after lower+trim, matching the
  * corpus's normalized form; `tokensRegex` offers the BPE-ish regex
  * alternative for noisy text.
  */
object TextAnalysis {

  /** Per-language marker lexicons (tiny, high-frequency function words). */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "on"),
    "es" -> Seq("el", "la", "de", "los", "y", "en", "que", "una"),
    "fr" -> Seq("le", "les", "des", "et", "une", "dans", "est", "pour"),
    "de" -> Seq("der", "die", "das", "und", "von", "mit", "ist", "ein"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1"))

  val stopwordsEn: Seq[String] = lexicons.head._2

  /** Normalized whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), " ")

  /** BPE-ish token stream: maximal alpha / digit runs. */
  def tokensRegex(text: Column): Column = // kept simple + RE2-compatible for oracle parity
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+"), lit(0))

  /** Count of tokens present in `lexicon`. */
  def lexiconHits(toks: Column, lexicon: Seq[String]): Column =
    size(filter(toks, w => w.isInCollection(lexicon))).cast("long")

  /** Language-ID by argmax of lexicon hits, ties broken by lexicon order,
    * all-zero -> "unknown". Returns (lang_pred, n_hits) columns.
    */
  def langId(text: Column): (Column, Column) = {
    val toks = tokens(text)
    val hits = lexicons.map { case (lang, lex) => lang -> lexiconHits(toks, lex) }
    val maxHits = greatest(hits.map(_._2): _*)
    // first language (in lexicon order) reaching the max wins
    val pred = hits.tail.foldLeft(when(hits.head._2 === maxHits, lit(hits.head._1))) {
      case (chain, (lang, h)) => chain.when(h === maxHits, lit(lang))
    }
    (when(maxHits === 0, lit("unknown")).otherwise(pred), maxHits)
  }

  /** Quality features + a composite score in [0,1]:
    * token count, unique-token ratio, mean token length, stopword ratio.
    *
    * Pass-through: input columns are kept, features appended — stateless
    * map stages chain without joins (and run unchanged on streams).
    */
  def quality(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("n_chars", length(col(textCol)).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_unique", size(array_distinct(toks)).cast("long"))
      .withColumn("n_stopwords", lexiconHits(toks, stopwordsEn))
      .withColumn("unique_ratio", col("n_unique").cast("double") / col("n_tokens"))
      .withColumn("stopword_ratio", col("n_stopwords").cast("double") / col("n_tokens"))
      .withColumn("mean_token_len",
        (col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens"))
      .withColumn("quality_score",
        round(lit(0.5) * col("unique_ratio")
          + lit(0.3) * least(col("stopword_ratio") * 4, lit(1.0))
          + lit(0.2) * least(col("n_tokens").cast("double") / 100.0, lit(1.0)), 6))
  }

  /** Within-document repetition metrics (the Gopher-rule family): total
    * bigram count, the share held by the single most frequent bigram, and
    * the share held by bigrams occurring more than once. High values mark
    * boilerplate/spam for quality filtering.
    *
    * Shape: explode bigrams → count per (doc, bigram) → roll up per doc.
    * Both aggregations are partial (map-side combine) and keyed by doc id,
    * so no single hot key exists at any corpus size. Documents with fewer
    * than two tokens have no bigrams and are excluded (explode of empty).
    */
  def repetition(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val bigrams = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i + 1, lit(2)))))
    graft.Tables.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(bigrams).as("bigram"))
      .groupBy(col(idCol), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        sum("c").as("n_bigrams"),
        max("c").as("top_c"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup_c"))
      .select(col(idCol),
        col("n_bigrams").cast("long").as("n_bigrams"),
        round(col("top_c").cast("double") / col("n_bigrams"), 6).as("top_bigram_frac"),
        round(col("dup_c").cast("double") / col("n_bigrams"), 6).as("dup_bigram_frac"))
  }

  /** PII patterns kept RE2-compatible (no backrefs/lookarounds) so the
    * same regexes run in the SQL oracle. Phone requires a leading `+` —
    * the conservative-precision choice for corpus scrubbing.
    */
  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val phoneRe = "\\+[0-9][0-9 -]{7,}[0-9]"

  /** PII scrub: replace emails / IPv4s / `+`-prefixed phone numbers with
    * typed placeholders and report per-kind match counts. Map-only (one
    * codegen'd regexp pass per kind — no shuffle, no UDF); counts are
    * taken on the ORIGINAL text, replacements applied email → ip → phone.
    * Pass-through: input columns kept, counts + `clean_text` appended.
    */
  def redactPii(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    def n(re: String) = size(regexp_extract_all(t, lit(re), lit(0))).cast("long")
    df.withColumn("n_emails", n(emailRe))
      .withColumn("n_ips", n(ipv4Re))
      .withColumn("n_phones", n(phoneRe))
      .withColumn("clean_text",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, emailRe, "<EMAIL>"),
            ipv4Re, "<IP>"),
          phoneRe, "<PHONE>"))
  }

  /** C4/CCNet-style boilerplate removal: drop every LINE that appears in
    * ≥ `minDf` distinct documents of the same `groupCol` (site headers,
    * footers, cookie banners — content repeated across a domain is
    * template, not text), then reassemble each document in original line
    * order.
    *
    * Scale shape: one explode to (doc, line_no, line); line document
    * frequency is a two-level aggregate (distinct (group, line, doc)
    * partial-dedups map-side before the exchange — the hot boilerplate
    * lines are exactly the ones whose duplicates collapse early); the
    * boilerplate set (df ≥ minDf) is by construction tiny and joins back
    * BROADCAST; reassembly is one shuffle by doc id with an in-row
    * array_sort — no window. Documents whose every line is boilerplate
    * survive as empty text (pass-through row count).
    */
  def removeBoilerplateLines(df: DataFrame, textCol: String, idCol: String,
                             groupCol: String, minDf: Int): DataFrame = {
    val lines = df.select(col(idCol), col(groupCol),
        posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
    val hot = lines.select(col(groupCol), col("line"), col(idCol))
      .distinct()
      .groupBy(col(groupCol), col("line"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col(groupCol), col("line"), lit(true).as("__boiler"))
    lines.join(broadcast(hot), Seq(groupCol, "line"), "left")
      .groupBy(col(idCol))
      .agg(concat_ws("\n", transform(
        array_sort(collect_list(when(col("__boiler").isNull,
          struct(col("line_no"), col("line"))))),
        x => x("line"))).as("clean_text"))
  }

  /** C4 cleaning rules (Raffel et al. 2020, JMLR 21(140) §2.2) at line
    * and page level: keep a line only if it ends in a terminal
    * punctuation mark, has at least `minWordsPerLine` words, and
    * mentions none of the `badLine` substrings (canonically
    * "javascript"); flag the whole page for dropping when it contains a
    * curly brace (code), any `badPage` phrase ("lorem ipsum"), or fewer
    * than `minKeptLines` surviving lines.
    *
    * Entirely in-row (split → filter → concat on the line array): a
    * map-only codegen stage — no shuffle, no UDF — that runs unchanged
    * on streams and costs one pass over the bytes at any corpus size.
    * Pass-through: input columns kept; `n_lines`, `n_kept`,
    * `clean_text`, `keep_page` appended.
    */
  def c4LineFilter(df: DataFrame, textCol: String, idCol: String,
                   minWordsPerLine: Int = 3,
                   badLine: Seq[String] = Seq("javascript"),
                   badPage: Seq[String] = Seq("lorem ipsum"),
                   minKeptLines: Int = 1): DataFrame = {
    val lines = split(col(textCol), "\n")
    def lineOk(l: Column): Column = {
      val t = trim(l)
      val base = t.rlike("[.!?\"]$") && (size(split(t, " +")) >= minWordsPerLine)
      badLine.foldLeft(base)((acc, b) => acc && !lower(t).contains(b))
    }
    val kept = filter(lines, lineOk _)
    val pageBad = badPage.foldLeft(col(textCol).contains("{")) {
      (acc, b) => acc || lower(col(textCol)).contains(b)
    }
    df.withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_kept", size(kept).cast("long"))
      .withColumn("clean_text", concat_ws("\n", kept))
      .withColumn("keep_page", !pageBad && col("n_kept") >= minKeptLines)
  }

  /** Per-document character-distribution statistics — the cheap
    * gibberish / low-information screen (encoding junk, base64 blobs and
    * key-mash text sit at the distribution extremes): distinct-character
    * count, the share of the most frequent character, Simpson diversity
    * 1 − Σp², and Shannon entropy in nats.
    *
    * Everything is computed IN-ROW by ONE native code-point pass
    * ([[graft.functions.CharDistStats]], whole-stage codegen) — map-only,
    * no explode, no shuffle, O(len) per row — and because the per-row
    * floating sums fold in one fixed (ascending code point = UTF-8 byte
    * sort) order, the rounded values are identical on a laptop, a
    * 1000-executor cluster, and the SQL oracle (whose O(|alphabet| · len)
    * list-lambda formulation folds the same terms in the same order).
    * Empty documents report zero entropy.
    */
  def charStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // struct built once in its own projection; the field split stays a
    // separate projection (CollapseProject leaves non-cheap expressions
    // referenced more than once alone, so the pass runs once per row)
    val stats = df.withColumn("_cs", graft.functions.char_dist_stats(col(textCol)))
    stats
      .withColumn("n_chars", length(col(textCol)).cast("long"))
      .withColumn("n_distinct_chars", col("_cs.n_distinct"))
      .withColumn("top_char_frac",
        when(col("n_chars") === 0, lit(0.0))
          .otherwise(round(col("_cs.top_frac"), 6)))
      .withColumn("char_simpson",
        when(col("n_chars") === 0, lit(0.0))
          .otherwise(round(col("_cs.simpson"), 6)))
      .withColumn("char_entropy",
        when(col("n_chars") === 0, lit(0.0))
          .otherwise(round(col("_cs.entropy"), 6)))
      .drop("_cs")
  }

  /** HTML → text extraction (the step BEFORE any quality/dedup pass in a
    * web-crawl pipeline): drop `<script>`/`<style>` blocks and comments,
    * strip remaining tags, decode the six common entities (`&amp;` last,
    * so double-escaped text stays escaped one level — standard
    * single-pass semantics), collapse whitespace, trim. All patterns are
    * RE2-compatible (non-greedy dotall, no lookarounds/backrefs) so the
    * identical regexes replay in the SQL oracle; entity decoding uses
    * literal `replace`, not regex. A chain of codegen'd passes —
    * map-only at any corpus size.
    */
  def htmlToText(text: Column): Column = {
    val noBlocks = Seq("script", "style").foldLeft(text) { (c, tag) =>
      regexp_replace(c, s"(?s)<$tag[^>]*>.*?</$tag>", " ")
    }
    val noTags = regexp_replace(
      regexp_replace(noBlocks, "(?s)<!--.*?-->", " "), "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Canonical content fingerprint: md5 of the normalized token stream. */
  def canonicalFingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Order-sensitive rolling fingerprint: polynomial hash over per-token
    * md5-derived 24-bit ints, mod 1e9+7 — portable across engines (same
    * arithmetic is expressible in ANSI SQL for the oracle).
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, w) => (acc * 31 + conv(substring(md5(w), 1, 6), 16, 10).cast("long")) % 1000000007L)
}
