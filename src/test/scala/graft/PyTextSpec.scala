package graft

import org.apache.spark.sql.functions._
import graft.functions.{py_capitalize, py_title}

/** Parity fixtures for the exact-Python string expressions (SURVEY.md
  * F3/F4). Expected values are Python's own outputs for
  * `s.capitalize()` / `s.title()` (CPython semantics: capitalize lowers
  * the tail; title treats every non-letter as a word boundary).
  */
class PyTextSpec extends SparkSpec {
  import spark.implicits._

  private def runCap(s: String): String =
    Seq(s).toDF("x").select(py_capitalize(col("x"))).head().getString(0)
  private def runTitle(s: String): String =
    Seq(s).toDF("x").select(py_title(col("x"))).head().getString(0)

  test("capitalize: first upper, rest lower") {
    assert(runCap("NOEMI") == "Noemi")
    assert(runCap("guillermo") == "Guillermo")
    assert(runCap("mIxEd CaSe") == "Mixed case") // initcap would give "Mixed Case"
    assert(runCap("") == "")
    assert(runCap("1abc") == "1abc")
    assert(runCap("querétaro") == "Querétaro")
  }

  test("title: boundary at any non-letter") {
    assert(runTitle("san juan") == "San Juan")
    assert(runTitle("o'hara") == "O'Hara") // initcap would give "O'hara"
    assert(runTitle("part12x") == "Part12X") // digit is a boundary in Python
    assert(runTitle("a-b c") == "A-B C")
    assert(runTitle("SAN LUIS") == "San Luis")
    assert(runTitle("") == "")
  }

  test("null propagation") {
    val r = Seq[String](null.asInstanceOf[String]).toDF("x")
      .select(py_capitalize(col("x")), py_title(col("x"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("codegen path matches interpreted path") {
    // A filter + projection keeps the expression inside whole-stage
    // codegen; compare against the eval-only path via a literal fold.
    val df = Seq("NOEMI", " san luis ", "o'hara x", "A1b2C3").toDF("x")
    val gen = df.select(py_title(lower(trim(col("x")))).as("t")).collect().map(_.getString(0))
    val expected = Seq("Noemi", "San Luis", "O'Hara X", "A1B2C3")
    assert(gen.toSeq == expected)
  }
}
