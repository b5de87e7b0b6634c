package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Privacy release gates. PII redaction (TextAnalysis.redactPii) removes
  * direct identifiers from text; this module covers the OTHER half of a
  * data-release review: quasi-identifier re-identification risk. A table
  * is k-anonymous over a set of quasi-identifier columns when every
  * combination of their values is shared by at least k rows (Sweeney,
  * 2002 — public literature); a group smaller than k is a
  * re-identification handle (join it with any external dataset carrying
  * the same quasi-identifiers and the members are pinned to ≤ k-1
  * candidates).
  *
  * Scale shape: ONE partial+final aggregate over the corpus — the
  * violation report is group-sized, never corpus-sized, and no row
  * content leaves the executors (only the quasi-identifier tuple and a
  * count). Choosing the quasi-identifier set is the caller's modeling
  * decision; this operator just makes the audit a one-pass query.
  */
object Privacy {

  /** Quasi-identifier groups with fewer than `k` members — empty result
    * ⇔ the table is k-anonymous over `quasiCols`. Strict inequality:
    * a group of exactly k satisfies k-anonymity.
    */
  def kAnonViolations(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "k-anonymity needs at least one quasi-identifier")
    require(k >= 2, "k < 2 makes every group compliant by definition")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** l-diversity violations (Machanavajjhala et al., 2007 — public
    * literature): quasi-identifier groups whose SENSITIVE attribute
    * takes fewer than `l` distinct values. k-anonymity alone leaves the
    * homogeneity attack open — a large group all sharing one sensitive
    * value discloses it for every member without identifying anyone;
    * distinct-l-diversity is the standard counter. Same one-aggregate
    * scale shape as the k check (the distinct count adds an Expand,
    * still one corpus pass; the report stays group-sized).
    */
  def lDiversityViolations(df: DataFrame, quasiCols: Seq[String],
                           sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "l-diversity needs at least one quasi-identifier")
    require(l >= 2, "l < 2 makes every group compliant by definition")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .filter(col("n_sensitive") < l)
  }
}
