package graft

import org.apache.spark.sql.types.{TimestampType}

/** Pins `Tables.load`'s events timestamp handling against BOTH parquet
  * encodings the harness has shipped: TIMESTAMP(NANOS) (pre round-3
  * regeneration; Spark reads as int64 via nanosAsLong) and TIMESTAMP(MICROS)
  * with isAdjustedToUTC=0 (current; Spark reads as TIMESTAMP_NTZ).
  *
  * Round 3 lost the entire ev_* query family when the harness regenerated
  * /root/testdata from nanos to micros and the loader hard-coded the nanos
  * path. This spec reads identical rows through both encodings (fixtures in
  * src/test/resources/events_fixture) and asserts byte-identical results, so
  * a future re-encoding fails here first instead of at driver scoring time.
  */
class EventsLoaderSpec extends SparkSpec {

  private def fixture(kind: String): String = {
    val url = getClass.getClassLoader.getResource(s"events_fixture/$kind/events.parquet")
    assert(url != null, s"missing fixture events_fixture/$kind")
    new java.io.File(url.toURI).getParent
  }

  private def loadTs(kind: String) = {
    val df = Tables.load(spark, fixture(kind), "events")
    assert(df.schema("ts").dataType == TimestampType, s"$kind: ts must normalize to TIMESTAMP")
    df.selectExpr("event_id", "unix_micros(ts) as us", "user_id", "event_type", "value", "props")
      .orderBy("event_id")
      .collect()
      .toSeq
  }

  test("nanos-encoded and micros-encoded events load to identical timestamps") {
    val micros = loadTs("micros")
    val nanos  = loadTs("nanos")
    assert(micros.nonEmpty)
    assert(micros == nanos)
    // Pin an absolute value so both paths can't be identically wrong:
    // 2024-01-01T00:09:58.778549Z = 1704067798778549 µs since epoch.
    assert(micros.head.getLong(1) == 1704067798778549L)
  }

  test("plain-int64-micros events dispatch on magnitude, not schema guess") {
    // A third plausible harness encoding: ts as bare int64 epoch MICROS.
    // It reads as LongType exactly like the nanos encoding — the loader
    // must dispatch per value on magnitude (~1.7e15 micros vs ~1.7e18
    // nanos) instead of assuming nanos and landing 1000x off.
    assert(loadTs("int64us") == loadTs("micros"))
  }

  test("current harness testdata loads and analyzes") {
    val dir = "/root/testdata/sf0.001"
    if (new java.io.File(s"$dir/events.parquet").exists()) {
      val df = Tables.load(spark, dir, "events")
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.limit(5).count() == 5)
    }
  }
}
