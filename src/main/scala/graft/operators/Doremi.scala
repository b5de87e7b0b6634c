package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame}

/** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi: Optimizing
  * Data Mixtures Speeds Up Language Model Pretraining", arXiv:2305.10429):
  * compute each domain's EXCESS LOSS — how much worse a small proxy model
  * does than a reference model on that domain's documents — then run
  * multiplicative-weights rounds so domains where the proxy has the most
  * headroom get up-weighted in the next pretraining mixture, with uniform
  * smoothing so no domain starves.
  *
  * Two deliberate deviations from the paper, both in the engine's
  * established style:
  *  - the UPDATE uses the linearized multiplicative-weights rule
  *    `α · (1 + η·λ)` (the classic MW variant — Arora, Hazan & Kale 2012,
  *    §2) instead of `α · exp(η·λ)`: for the small per-round λ this is the
  *    first-order expansion of the same update, and unlike `exp` it is a
  *    pure IEEE +/× chain, so the iteration replays BIT-exactly in any
  *    engine (the same reason QualityModel uses the exp-free Elliot link);
  *  - weights live on the 1e-12 integer grid (`floor(α·1e12)`), so the
  *    per-round normalizer is a sum of integer-valued doubles — exact and
  *    ORDER-FREE below 2^53 — and a 1000-executor run, a laptop run and
  *    the SQL oracle produce identical weights. The 2^53 bound is a real
  *    precondition, enforced: excess is clamped to 1e3 and `eta ≤ 8`, so
  *    `u = α·(1 + η·excess) ≤ 1e12·(1 + 8·1e3) ≈ 8.0e15 < 2^53`, and the
  *    normalizer Σu inherits the same bound because Σα = 1e12 by
  *    construction — every fixed-point quantity round-trips long ↔ double
  *    losslessly in both engines.
  *
  * Scale shape: ONE corpus scan (a partial-aggregatable per-domain
  * fixed-point mean of clamp(proxy − ref, 0, ∞)); every later round is a
  * projection + window over the DOMAIN-sized table (tens of rows at any
  * corpus size — the single-partition window is over K domains, never
  * data). No collect anywhere; the weights stay a DataFrame, ready to be
  * persisted as the model-sized mixture artifact `mixtureTemperature` /
  * `mixtureSelect` consume.
  */
object Doremi {

  /** Per-domain mixture weights after `rounds` MW updates.
    *
    * Output: (domain, n_docs, excess, weight) — `excess` is the clamped
    * mean proxy-minus-reference loss, `weight` the final mixture share
    * (sums to ~1 up to the smoothing grid).
    */
  def domainWeights(df: DataFrame, domainCol: String,
                    proxyLoss: Column, refLoss: Column,
                    eta: Double = 1.0, smooth: Double = 0.01,
                    rounds: Int = 5): DataFrame = {
    require(rounds >= 1 && eta > 0 && eta <= 8 && smooth >= 0 && smooth < 1,
      s"bad MW hyperparameters: eta=$eta smooth=$smooth rounds=$rounds " +
        "(eta <= 8 keeps every fixed-point quantity below 2^53)")
    // fixed-point mean (qsum pattern): floor-quantized 1e-12 units summed
    // as exact DECIMAL(38,0) — re-association-free across partitionings
    val term = greatest(proxyLoss - refLoss, lit(0.0))
    // rows without a usable loss pair are excluded from BOTH the
    // numerator and the denominator: a null loss would otherwise skip the
    // sum but still count in n_docs (silently deflating the domain's
    // excess), and a NaN would propagate through every MW round
    val usable = proxyLoss.isNotNull && refLoss.isNotNull &&
      !isnan(proxyLoss.cast("double")) && !isnan(refLoss.cast("double"))
    val base = df
      .filter(usable)
      .groupBy(col(domainCol).cast("string").as("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(floor(least(term, lit(1.0e3)) * lit(1.0e12))
          .cast(DecimalType(38, 0))).cast("double") / lit(1.0e12)).as("esum"))
      .withColumn("excess", col("esum") / col("n_docs"))
      .drop("esum")
    // K domains — model-sized; the empty-frame window is over K rows only
    val w = Window.partitionBy(lit(0))
    var cur = base
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("alpha_fx", floor(lit(1.0e12) / col("k")))
    (1 to rounds).foreach { _ =>
      cur = cur
        // u stays integer-valued on the 1e-12 grid -> the window sum is
        // a sum of integers < 2^53: exact in double, any order
        .withColumn("u_fx",
          floor(col("alpha_fx") * (lit(1.0) + lit(eta) * col("excess"))))
        .withColumn("s_fx", sum(col("u_fx")).over(w))
        .withColumn("alpha_fx",
          floor(((lit(1.0) - lit(smooth)) * col("u_fx") / col("s_fx")
            + lit(smooth) / col("k")) * lit(1.0e12)))
        .drop("u_fx", "s_fx")
    }
    cur.select(col("domain"), col("n_docs"), col("excess"),
      (col("alpha_fx") / lit(1.0e12)).as("weight"))
  }
}
