package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

import graft.operators.ValidatingTransform
import graft.pipeline.BatchEtl
import graft.warehouse.Warehouse

/** Byte-level printed-output parity with ALL SIX reference scripts.
  *
  * The goldens under src/test/resources/goldens/ are the captured stdout
  * of the Python scripts themselves (run against the read-only fixtures;
  * basic/refactor/from_csv need a pre-existing legacy `personas_limpias`
  * table — on a fresh database their migration INSERT..SELECT crashes, so
  * the goldens reflect the documented empty-legacy-table migration path).
  * Each test REPRODUCES the script's printed output from graft's own
  * operators and compares the full text, masking only wall-clock values
  * (run ids, timestamps) where the reference prints them.
  */
class ReferenceStageGoldenSpec extends SparkSpec {
  import spark.implicits._

  private val fixtureDir = "/root/reference/data/in"

  /** Captured stdout/files; CRLF (Python csv's default terminator)
    * normalized to LF — the parity under test is content and column
    * order, not the OS line convention.
    */
  private def golden(name: String): String = {
    val in = getClass.getResourceAsStream(s"/goldens/$name")
    assume(in != null, s"golden $name missing")
    try new String(in.readAllBytes(), StandardCharsets.UTF_8).replace("\r\n", "\n")
    finally in.close()
  }

  /** Python tuple repr: strings quoted with ', ints/doubles bare. */
  private def pyTuple(vals: Any*): String = vals.map {
    case s: String => s"'$s'"
    case d: Double => if (d == d.floor && !d.isInfinite) s"${d.toLong}.0" else d.toString
    case other => other.toString
  }.mkString("(", ", ", ")")

  private def mask(s: String): String = s
    .replaceAll("\\d{8}T\\d{6}\\d*Z(_[A-Za-z0-9_]+)?", "<RUN>")
    .replaceAll("\\d{4}-\\d{2}-\\d{2}T[0-9:.]+\\+00:00", "<TS>")

  /** The four inline raw rows of etl_basic/etl_refactor. */
  private def inlineRaw: DataFrame = Seq(
    ("  guillermo ", "26", "san luis"),
    ("NOEMI", "52", "SAN LUIS"),
    ("Naomi ", "23", " san juan"),
    ("Pedro", "error", "Querétaro"))
    .toDF("nombre", "edad", "ciudad")

  /** Clean + filter with the engine's own expressions, keeping an input
    * index (the reference prints in list order).
    */
  private def cleaned(raw: DataFrame, minAge: Int): DataFrame =
    raw.withColumn("__idx", monotonically_increasing_id())
      .select(col("__idx"),
        graft.functions.py_capitalize(lower(trim(col("nombre")))).as("nombre"),
        trim(col("edad")).try_cast("int").as("edad"),
        graft.functions.py_title(lower(trim(col("ciudad")))).as("ciudad"))
      .filter(col("edad").isNotNull && col("edad") >= minAge)

  private def tuples(df: DataFrame): Seq[String] =
    df.orderBy("__idx").drop("__idx").collect().toSeq.map(r => pyTuple(r.toSeq: _*))

  private def withIds(df: DataFrame): DataFrame = {
    // presentation ids: AUTOINCREMENT order = insert order = input order
    val w = Window.orderBy(col("__idx"))
    df.withColumn("id", row_number().over(w))
      .select("__idx", "id", "nombre", "edad", "ciudad")
  }

  test("etl_basic: printed stages match the script's stdout") {
    val clean = cleaned(inlineRaw, 25).cache()
    val out = new StringBuilder
    out ++= "Datos limpios:\n"
    tuples(clean).foreach(t => out ++= t += '\n')
    out ++= "Datos cargados en SQLite (sin duplicados).\n"
    out ++= "\nContenido final de personas_limpias:\n"
    tuples(withIds(clean)).foreach(t => out ++= t += '\n')
    assert(out.toString == golden("etl_basic.stdout"))
  }

  test("etl_refactor: printed stages + ETL log match the script's stdout") {
    val wh = new Warehouse(spark, tempDir("g_refactor"))
    val clean = cleaned(inlineRaw, 25).cache()
    val antes = wh.readIfExists("personas_limpias").map(_.count()).getOrElse(0L)
    val stats = wh.idempotentAppend("personas_limpias", clean.drop("__idx"),
      Seq("nombre", "edad", "ciudad"))
    val despues = wh.read("personas_limpias").count()
    val out = new StringBuilder
    out ++= "Datos limpios:\n"
    tuples(clean).foreach(t => out ++= t += '\n')
    out ++= "\nDatos cargados en SQLite (sin duplicados).\n"
    out ++= "\n--- LOG ETL ---\n"
    out ++= s"Registros limpios (transform): ${stats.attempted}\n"
    out ++= s"Filas en tabla antes: $antes\n"
    out ++= s"Insertados nuevos: ${stats.inserted}\n"
    out ++= s"Ignorados por duplicado: ${stats.ignored}\n"
    out ++= s"Filas en tabla después: $despues\n"
    out ++= "\nContenido final de personas_limpias:\n"
    tuples(withIds(clean)).foreach(t => out ++= t += '\n')
    assert(out.toString == golden("etl_refactor.stdout"))
  }

  test("etl_from_csv: csv fixture through the same stages") {
    assume(new java.io.File(s"$fixtureDir/personas_crudas.csv").exists())
    val wh = new Warehouse(spark, tempDir("g_fromcsv"))
    val etl = new BatchEtl(spark, wh)
    val clean = cleaned(etl.extractCsv(s"$fixtureDir/personas_crudas.csv"), 25).cache()
    val stats = wh.idempotentAppend("personas_limpias", clean.drop("__idx"),
      Seq("nombre", "edad", "ciudad"))
    val despues = wh.read("personas_limpias").count()
    val out = new StringBuilder
    out ++= "Datos limpios (desde CSV):\n"
    tuples(clean).foreach(t => out ++= t += '\n')
    out ++= "\nDatos cargados en SQLite (sin duplicados).\n"
    out ++= "\n--- LOG ETL ---\n"
    out ++= s"Registros limpios (transform): ${stats.attempted}\n"
    out ++= "Filas en tabla antes: 0\n"
    out ++= s"Insertados nuevos: ${stats.inserted}\n"
    out ++= s"Ignorados por duplicado: ${stats.ignored}\n"
    out ++= s"Filas en tabla después: $despues\n"
    out ++= "\nContenido final de personas_limpias:\n"
    tuples(withIds(clean)).foreach(t => out ++= t += '\n')
    assert(out.toString == golden("etl_from_csv.stdout"))
  }

  test("etl_relational: valid/reject split, reject csv bytes, join + city counts") {
    assume(new java.io.File(s"$fixtureDir/personas_crudas.csv").exists())
    val wh = new Warehouse(spark, tempDir("g_relational"))
    val etl = new BatchEtl(spark, wh)
    val raw = etl.extractCsv(s"$fixtureDir/personas_crudas.csv")
    val routed = ValidatingTransform(raw, 25) // relational reason vocabulary
    val clean = cleaned(raw, 25).cache()

    // reject csv: FIXED column order (scr/etl_relational.py:96-101), raw values
    val rejLines = routed.rejected
      .select("nombre", "edad", "ciudad", "motivo").collect().toSeq
      .map(_.toSeq.map(v => Option(v).map(_.toString).getOrElse("")).mkString(","))
    val rejCsv = ("nombre,edad,ciudad,motivo" +: rejLines).mkString("", "\n", "\n")
    assert(rejCsv == golden("rejected_relational.csv"))

    // load: dimension + idempotent fact append
    val dim = wh.ensureDimension("ciudades", clean.select(col("ciudad").as("nombre")),
      "nombre", "ciudad_id")
    val withFk = clean
      .join(broadcast(dim.select(col("ciudad_id"), col("nombre").as("ciudad"))), Seq("ciudad"))
      .select(col("nombre"), col("edad"), col("ciudad_id"))
    val stats = wh.idempotentAppend("personas_limpias", withFk,
      Seq("nombre", "edad", "ciudad_id"))
    val despues = wh.read("personas_limpias").count()

    val out = new StringBuilder
    out ++= "Válidos (listos para cargar):\n"
    tuples(clean).foreach(t => out ++= t += '\n')
    out ++= s"\nRechazados guardados en: rejected.csv  (total=${rejLines.size})\n"
    out ++= "\nDatos cargados en SQLite (modelo relacional, sin duplicados).\n"
    out ++= "\n--- LOG LOAD ---\n"
    out ++= s"Registros válidos (transform): ${stats.attempted}\n"
    out ++= "Filas en personas_limpias antes: 0\n"
    out ++= s"Insertados nuevos: ${stats.inserted}\n"
    out ++= s"Ignorados por duplicado: ${stats.ignored}\n"
    out ++= s"Filas en personas_limpias después: $despues\n"
    out ++= "\n--- JOIN (personas + ciudades) ---\n"
    tuples(withIds(clean)).foreach(t => out ++= t += '\n')
    out ++= "\n--- Conteo por ciudad (SQL) ---\n"
    etl.cityAggregate().collect().foreach { r =>
      out ++= pyTuple(r.getString(0), r.getLong(1), r.getDouble(2)) += '\n'
    }
    assert(out.toString == golden("etl_relational.stdout"))
  }

  test("etl_batch: per-file reports and sorted-column reject csv bytes") {
    assume(new java.io.File(s"$fixtureDir/personas_crudas.csv").exists())
    val in = tempDir("g_batch_in")
    val rejectDir = tempDir("g_batch_rej")
    Files.copy(Paths.get(s"$fixtureDir/personas.csv"), Paths.get(s"$in/personas.csv"))
    Files.copy(Paths.get(s"$fixtureDir/personas_crudas.csv"),
      Paths.get(s"$in/personas_crudas.csv"))
    val wh = new Warehouse(spark, tempDir("g_batch_wh"))
    val etl = new BatchEtl(spark, wh)
    val reports = etl.run(in, Some(rejectDir))

    val out = new StringBuilder
    reports.foreach { r =>
      out ++= s"\n📦 ${r.sourceFile}\n"
      out ++= s"  válidos=${r.validCount} rechazados=${r.rejectedCount}\n"
      out ++= s"  insertados_nuevos=${r.insertedNew} duplicados_ignorados=${r.ignoredDuplicates}\n"
      out ++= s"  run_id=${r.runId}\n"
    }
    out ++= "\n✅ Batch ETL finalizado\n"
    assert(mask(out.toString) == mask(golden("etl_batch.stdout")))

    // reject files: sorted union of columns (scr/etl_batch.py:75), raw
    // values, batch reason vocabulary — byte-compare with the script's own
    def written(dir: String): String = {
      val part = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv")).head
      new String(Files.readAllBytes(part.toPath), StandardCharsets.UTF_8)
    }
    assert(written(s"$rejectDir/rejected_personas_crudas") ==
      golden("rejected_personas_crudas.csv"))
    assert(written(s"$rejectDir/rejected_personas") == golden("rejected_personas.csv"))
  }

  test("etl_incremental_audit: migration-aware load + audit log, masked clocks") {
    assume(new java.io.File(s"$fixtureDir/personas_crudas.csv").exists())
    val wh = new Warehouse(spark, tempDir("g_audit"))
    val etl = new BatchEtl(spark, wh)
    val raw = etl.extractCsv(s"$fixtureDir/personas_crudas.csv")
    val routed = ValidatingTransform(raw, 25) // audit shares the relational vocabulary
    val clean = cleaned(raw, 25).cache()
    val nRej = routed.rejected.count()

    val runId = "20260101T000000Z"
    val startedAt = "2026-01-01T00:00:00.000000+00:00"
    val dim = wh.ensureDimension("ciudades", clean.select(col("ciudad").as("nombre")),
      "nombre", "ciudad_id")
    val withFk = clean
      .join(broadcast(dim.select(col("ciudad_id"), col("nombre").as("ciudad"))), Seq("ciudad"))
      .select(col("nombre"), col("edad"), col("ciudad_id"),
        lit(startedAt).as("processed_at"), lit(runId).as("run_id"))
    val stats = wh.idempotentAppend("personas_limpias", withFk,
      Seq("nombre", "edad", "ciudad_id"))
    wh.appendAudit("etl_runs", runId, startedAt, "personas_crudas.csv",
      stats.attempted, nRej, stats.inserted, stats.ignored)
    val despues = wh.read("personas_limpias").count()
    assert(wh.read("etl_runs").count() == 1)

    val out = new StringBuilder
    out ++= s"📄 Rechazados guardados en: rejected.csv (total=$nRej)\n"
    out ++= "\nVálidos:\n"
    tuples(clean).foreach(t => out ++= t += '\n')
    out ++= "\n✅ LOAD incremental completo\n"
    out ++= "--- LOG RUN ---\n"
    out ++= s"run_id: $runId\n"
    out ++= s"started_at (UTC): $startedAt\n"
    out ++= "source_file: personas_crudas.csv\n"
    out ++= s"validos: ${stats.attempted} | rechazados: $nRej\n"
    out ++= s"insertados_nuevos: ${stats.inserted} | duplicados_ignorados: ${stats.ignored}\n"
    out ++= s"filas antes: 0 | filas después: $despues\n"
    out ++= "\n--- Preview filas de esta corrida (JOIN) ---\n"
    withIds(clean).orderBy("__idx").drop("__idx").collect().foreach { r =>
      out ++= pyTuple(r.getInt(0), r.getString(1), r.getInt(2), r.getString(3),
        startedAt, runId) += '\n'
    }
    assert(mask(out.toString) == mask(golden("etl_incremental_audit.stdout")))
  }
}
