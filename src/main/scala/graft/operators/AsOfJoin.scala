package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** As-of (point-in-time) join: attach to each left row the most recent
  * right row with `right.ts <= left.ts` for the same key — the lookup
  * every feature-store / event-enrichment pipeline needs and Spark has no
  * native operator for.
  *
  * Shape: tag both sides, union, and run ONE window pass per key ordered
  * by (ts, side) carrying the last right-side payload forward. That is a
  * single hash shuffle on the key plus an in-partition sort — the minimum
  * any as-of semantics requires — instead of the quadratic
  * `l JOIN r ON key AND r.ts <= l.ts` range-explosion a naive join plans
  * (every left row against every earlier right row, then a max per left
  * row). Scales with rows-per-key, never with pairs.
  */
object AsOfJoin {

  /** Left rows + `prefix`-named columns (`prefix+rightTs`,
    * `prefix+valueCols…`) from the latest right row at-or-before the left
    * timestamp; nulls when no such row. Right rows equal on
    * (key, ts) are ordered by `tieBreak` (any RIGHT-frame column names) —
    * pass it whenever right timestamps can collide within a key.
    *
    * Join-equality null semantics: right rows with a null key or null
    * timestamp can never match and are dropped up front; left rows with a
    * null key or timestamp come back with null as-of columns (the window
    * would otherwise group null keys together and "match" them).
    *
    * The payload travels as one struct, so legitimately-null right values
    * survive (a per-column last(ignoreNulls) would skip past them).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, valueCols: Seq[String],
           prefix: String = "asof_", tieBreak: Seq[String] = Nil): DataFrame = {
    val pTs = prefix + rightTs
    val pVals = valueCols.map(prefix + _)
    // carry tieBreak columns beyond valueCols through the union so the
    // ordering can see them; they stay out of the output payload
    val extraTie = tieBreak.filterNot(c => c == rightTs || valueCols.contains(c))
    val matchable = (keys :+ rightTs).map(col(_).isNotNull).reduce(_ && _)
    val r = right.filter(matchable).select(
      keys.map(col) ++ ((rightTs -> pTs) +: (valueCols ++ extraTie).map(c => c -> (prefix + c)))
        .map { case (src, dst) => col(src).as(dst) }: _*)
      .withColumn("__ts", col(pTs)).withColumn("__side", lit(0))
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left at equal ts: a right row AT the left
    // timestamp is eligible (standard `<=` as-of semantics). Null left
    // timestamps sort first (asc nulls-first), before every right row —
    // so they match nothing, as join semantics require.
    val ord: Seq[Column] = (col("__ts").asc +: col("__side").asc +:
      tieBreak.map(c => col(prefix + c).asc))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val payload = struct((pTs +: pVals).map(col): _*)
    unioned
      .withColumn("__m",
        last(when(col("__side") === 0, payload), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        (pTs +: pVals).map(f => col(s"__m.$f").as(f)): _*)
  }
}
