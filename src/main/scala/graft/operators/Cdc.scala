package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Snapshot differencing — the change-data-capture primitive between two
  * versions of a table: which keys were added, removed, or changed. The
  * warehouse counterpart of SCD2 (which APPLIES a new snapshot; this
  * REPORTS the delta — audits, incremental downstream triggers, backfill
  * scoping all start here).
  *
  * Scale shape: each side is reduced map-side to (key, content hash) —
  * one narrow row per input row — and the diff is ONE full-outer
  * shuffle join on the key columns. Nothing wider than key+hash crosses
  * the wire; at 100 TB the join shuffles two hash columns, not two
  * tables. With both snapshots bucket-written on the key
  * ([[graft.warehouse.Warehouse.writeBucketed]]) even that exchange
  * disappears.
  *
  * Determinism & oracle parity: the content hash is md5 over the value
  * columns joined with an ASCII unit separator (0x1f — absent from the
  * fixture text domains; a cross-column collision would need the
  * separator embedded AND aligned splits), nulls encoded as a sentinel
  * distinct from the empty string. Replayable in ANSI SQL via
  * `md5(concat_ws(chr(31), …))`.
  */
object Cdc {

  private val Sep = "\u001f"
  private val NullSentinel = "<null>"

  /** md5 content hash of `cols` in order — null-safe, separator-joined.
    *
    * Cross-engine contract: values enter the hash via CAST(col AS
    * STRING), whose rendering is engine-identical for STRING and
    * integral types only. Doubles, timestamps, decimals, and booleans
    * format differently across engines (Spark `true` vs DuckDB `true`
    * is fine, but `1.0E-5` vs `1e-05`, timestamp precision, and decimal
    * trailing zeros are not) — the diff itself stays CORRECT for any
    * type (both sides hash through the same engine), but ANSI-SQL
    * replayability of the hash needs such columns pre-formatted to
    * strings by the caller (e.g. `date_format`, `format_number`).
    */
  def rowHash(cols: Seq[Column]): Column =
    md5(concat_ws(Sep, cols.map(c => coalesce(c.cast("string"), lit(NullSentinel))): _*))

  /** Diff `oldDf` → `newDf` on `keyCols`, comparing `valueCols` content:
    * one row per key that changed state — (key…, change ∈ added |
    * removed | changed). Unchanged keys emit nothing (the usual CDC
    * contract: the delta is small even when the table is not).
    *
    * Keys join NULL-SAFELY (`<=>` — still an equi hash/merge join key in
    * Spark), so a key that is null in both snapshots compares by content
    * instead of reporting a spurious added+removed pair. PRECONDITION
    * (standard CDC contract): keys are unique within each snapshot;
    * duplicate keys multiply rows through the join. By default the
    * precondition is NOT checked (the usual contract — checking costs a
    * pass per side); `strict = true` verifies it with one narrow scalar
    * aggregate per side (total count vs distinct-key count over the key
    * projection — two already-reduced numbers, no extra shuffle width)
    * and fails fast instead of silently multiplying rows into a
    * downstream backfill.
    */
  def tableDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
                valueCols: Seq[String], strict: Boolean = false): DataFrame = {
    if (strict) {
      def assertUniqueKeys(df: DataFrame, side: String): Unit = {
        // count_distinct over a struct: a row whose key fields are null
        // still forms a non-null struct, so null keys are counted — the
        // same null-safe key semantics the join uses
        val r = df.agg(count(lit(1)),
          count_distinct(struct(keyCols.map(col): _*))).head()
        val (total, distinct) = (r.getLong(0), r.getLong(1))
        require(total == distinct,
          s"tableDiff strict: $side snapshot has ${total - distinct} " +
            s"duplicate rows over key (${keyCols.mkString(", ")})")
      }
      assertUniqueKeys(oldDf.select(keyCols.map(col): _*), "old")
      assertUniqueKeys(newDf.select(keyCols.map(col): _*), "new")
    }
    def sideHash(df: DataFrame, prefix: String, hashName: String) =
      df.select(keyCols.map(k => col(k).as(s"$prefix$k")) :+
        rowHash(valueCols.map(col)).as(hashName): _*)
    val o = sideHash(oldDf, "o_", "old_hash")
    val n = sideHash(newDf, "n_", "new_hash")
    val cond = keyCols.map(k => o(s"o_$k") <=> n(s"n_$k")).reduce(_ && _)
    o.join(n, cond, "full_outer")
      .withColumn("change",
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") =!= col("new_hash"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(k => coalesce(col(s"o_$k"), col(s"n_$k")).as(k)) :+
        col("change"): _*)
  }
}
