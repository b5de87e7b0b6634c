package graft

import org.apache.spark.sql.functions._

import graft.pipeline.BatchEtl
import graft.warehouse.Warehouse

/** Golden parity against the reference's own noisy fixture
  * (/root/reference/data/in/personas_crudas.csv, read-only): the pipeline
  * must reproduce the documented behavior of the reference scripts
  * (FIXTURES.md §1: 3 valid rows after normalization, 1 cast-reject,
  * 1 business-rule reject; per-city aggregate San Luis=2, San Juan=1).
  */
class ReferenceGoldenSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = "/root/reference/data/in/personas_crudas.csv"
  private val cleanFixture = "/root/reference/data/in/personas.csv"

  test("personas_crudas: routing + normalization goldens") {
    assume(new java.io.File(fixture).exists())
    val wh = new Warehouse(spark, tempDir("gwh"))
    val etl = new BatchEtl(spark, wh)
    val report = etl.processFile(fixture)
    assert(report.validCount == 3 && report.rejectedCount == 2)
    assert(report.insertedNew == 3 && report.ignoredDuplicates == 0)

    val persons = wh.read("personas_limpias")
      .join(wh.read("ciudades").select(col("ciudad_id"), col("nombre").as("ciudad")), "ciudad_id")
      .select(col("nombre"), col("edad"), col("ciudad"))
      .as[(String, Int, String)].collect().toSet
    assert(persons == Set(
      ("Guillermo", 26, "San Luis"), ("Noemi", 52, "San Luis"), ("Luis", 30, "San Juan")))

    // reject reasons exactly as the reference emits them
    val routed = graft.operators.ValidatingTransform(etl.extractCsv(fixture), 25)
    val reasons = routed.rejected.select("nombre", "motivo").as[(String, String)]
      .collect().toMap
    assert(reasons.values.toSet == Set("Edad no convertible a int", "Edad < 25"))

    // per-city aggregate golden (reference scr/etl_relational.py:198-204)
    val agg = etl.cityAggregate().as[(String, Long, Double)].collect().toSeq
    assert(agg == Seq(("San Luis", 2L, 39.0), ("San Juan", 1L, 30.0)))

    // idempotent re-run golden (reference README "Idempotencia")
    val again = etl.processFile(fixture)
    assert(again.insertedNew == 0 && again.ignoredDuplicates == 3)
  }

  test("personas.csv (clean fixture): one business-rule reject") {
    assume(new java.io.File(cleanFixture).exists())
    val wh = new Warehouse(spark, tempDir("gwh2"))
    val etl = new BatchEtl(spark, wh)
    val report = etl.processFile(cleanFixture)
    assert(report.validCount + report.rejectedCount ==
      etl.extractCsv(cleanFixture).count())
    assert(report.rejectedCount == 1) // Naomi, 23 < 25
  }
}
