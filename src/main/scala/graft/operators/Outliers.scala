package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Robust (median/MAD) outlier detection — the data-quality gate a
  * training pipeline runs on any numeric metric before it trusts the
  * distribution (anomalous event values, corrupted document lengths,
  * broken feature extractors). Mean/stddev z-scores mask outliers at high
  * contamination (the outliers inflate the stddev that is supposed to
  * flag them); the median/MAD "modified z-score" (Iglewicz & Hoaglin,
  * 1993 — public statistics literature) is the standard robust variant:
  *
  *   z = 0.6745 · (x − median) / MAD,   MAD = median(|x − median|)
  *
  * Scale shape: two grouped percentile passes over the corpus — exact
  * (`exact = true`, the anchor: per-group value buffers) or the GK
  * sketch (`exact = false`, the 100 TB path: O(accuracy) memory per
  * group, same split as a6_percentiles; ProfileOutliersSpec pins the
  * sketch's medians within 1% of exact) — then two joins against
  * group-sized stat tables, broadcast declaratively. No window over the
  * corpus, no driver collect.
  *
  * Determinism: exact interpolated percentiles carry the established
  * Spark↔DuckDB `quantile_cont` parity; dev/z are per-row IEEE ops.
  * Groups with MAD = 0 (over half the values at the median) emit no
  * outliers by definition — a degenerate spread makes every deviation
  * infinite, and flagging the whole group is never what a pipeline
  * wants; callers should gate such groups on exact-value rules instead.
  */
object Outliers {

  /** Rows of `df` whose `valueCol` is a robust outlier within its
    * `keyCol` group: |0.6745·(x−med)/MAD| > threshold. Output keeps
    * (keyCol, idCol, valueCol) and adds the modified z-score `z`.
    */
  def madOutliers(df: DataFrame, keyCol: String, idCol: String,
                  valueCol: String, threshold: Double = 3.5,
                  exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    val v = col(valueCol).cast("double")
    // typed percentile builders (no SQL-string interpolation — column
    // names with dots/quotes/backticks stay plain data)
    def med50(c: org.apache.spark.sql.Column) =
      if (exact) percentile(c, lit(0.5))
      else percentile_approx(c, lit(0.5), lit(accuracy)).cast("double")
    // the stat tables are |groups|-sized by construction — broadcast them
    // DECLARATIVELY rather than hoping AQE converts (the dev⋈mad join sits
    // inside a fused stage where AQE cannot re-plan it): the corpus is
    // never shuffled, only aggregated
    val med = df.groupBy(col(keyCol))
      .agg(med50(v).as("__med"))
    val dev = df.select(col(keyCol), col(idCol), v.as(valueCol))
      .join(broadcast(med), keyCol)
      .withColumn("__dev", col(valueCol) - col("__med"))
    val mad = dev.groupBy(col(keyCol))
      .agg(med50(abs(col("__dev"))).as("__mad"))
    dev.join(broadcast(mad), keyCol)
      .filter(col("__mad") > 0.0)
      .withColumn("z", lit(0.6745) * col("__dev") / col("__mad"))
      .filter(abs(col("z")) > threshold)
      .select(col(keyCol), col(idCol), col(valueCol), col("z"))
  }
}
