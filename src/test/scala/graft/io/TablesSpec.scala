package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Pins `Tables.events` against BOTH physical encodings the producer has
  * shipped for `events.ts` (TIMESTAMP(NANOS) historically, timestamp-micros
  * since 2026-08-13), so the next producer-side schema change fails ONE
  * named test with a message that says which physical type was observed —
  * instead of five integration suites at once (VERDICT r6 item 2).
  *
  * The fixtures live in test resources (`events_fixture/`), written with
  * the exact parquet logical types
  * (`Timestamp(timeUnit=nanoseconds|microseconds, isAdjustedToUTC=false)`).
  * The nanos fixture carries a 500 ns sub-microsecond tail so the
  * truncation contract (floor to micros, matching DuckDB's
  * TIMESTAMP_NS → TIMESTAMP cast) is actually observable.
  */
class TablesSpec extends SparkTestBase {

  private def res(name: String): String =
    getClass.getResource(s"/events_fixture/$name").getPath

  private def loaded(name: String) = {
    val df = Tables.eventsFrom(spark, res(name))
    val tsType = df.schema("ts").dataType
    assert(tsType == TimestampType,
      s"Tables.events must normalize ts to session-TZ TIMESTAMP; " +
        s"fixture $name produced $tsType — the producer likely shipped a " +
        s"new physical encoding that io/Tables.scala does not dispatch on")
    df
  }

  test("events loader: timestamp-micros encoding (current producer)") {
    val df = loaded("events_micros.parquet")
    assert(df.count() == 6)
    // row 3: base 2024-03-01T12:00:00Z + 3*37s + 3*113µs, exact under UTC
    val ts3 = df.filter(col("event_id") === 3)
      .select(unix_micros(col("ts"))).head().getLong(0)
    val expected = java.time.Instant.parse("2024-03-01T12:01:51Z")
      .getEpochSecond * 1000000L + 339L
    assert(ts3 == expected, s"micros must round-trip exactly, got $ts3")
  }

  test("events loader: TIMESTAMP(NANOS) encoding (historical producer)") {
    val df = loaded("events_nanos.parquet")
    assert(df.count() == 6)
    // the 500 ns tail must be FLOORED away (DuckDB-compatible truncation)
    val ts0 = df.filter(col("event_id") === 0)
      .select(unix_micros(col("ts"))).head().getLong(0)
    val expected = java.time.Instant.parse("2024-03-01T12:00:00Z")
      .getEpochSecond * 1000000L
    assert(ts0 == expected,
      s"nanos must truncate (not round) to micros, got $ts0")
  }

  test("both encodings agree after normalization (same logical data)") {
    val micros = loaded("events_micros.parquet")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val nanos = loaded("events_nanos.parquet")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    assert(micros.exceptAll(nanos).count() == 0 &&
      nanos.exceptAll(micros).count() == 0,
      "the two physical encodings of the same rows must load identically")
  }
}
