package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Generic first-match-wins reject routing (SURVEY.md P8).
  *
  * A rule's condition marks a row as rejected with the given reason; rules
  * are evaluated in order and the first failing one wins, reproducing the
  * reference's early-`continue` validation loop
  * (reference scr/etl_batch.py:50-67) as one codegen'd `when`-chain.
  */
object Validator {
  final case class Rule(condition: Column, reason: Column)

  /** `motivo` column: reason of the first matching rule, else null. */
  def motivo(rules: Seq[Rule]): Column =
    rules.tail.foldLeft(when(rules.head.condition, rules.head.reason)) {
      (chain, r) => chain.when(r.condition, r.reason)
    }

  /** Attach `motivo` to every row (null = valid). */
  def route(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.withColumn("motivo", motivo(rules))

  /** Split into (valid, rejected-with-motivo). */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val routed = route(df, rules)
    (routed.filter(col("motivo").isNull).drop("motivo"),
      routed.filter(col("motivo").isNotNull))
  }
}
