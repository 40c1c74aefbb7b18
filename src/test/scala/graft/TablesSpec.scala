package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Pins `Tables.events`' vintage detection: the driver's testdata has
  * stored `ts` as TIMESTAMP(NANOS) (readable only as a raw nanos long
  * under `spark.sql.legacy.parquet.nanosAsLong`) and, since the
  * 2026-08-13 regeneration, as TIMESTAMP(MICROS)/NTZ. The loader must
  * normalize every vintage to the same `ts_us` (exact epoch micros,
  * long) + micros `ts`, so all downstream event-time math — and the
  * DuckDB oracle's `epoch_us(ts)` — is vintage-independent. Each test
  * writes a one-vintage parquet and asserts the identical normalized
  * output; without this, only the vintage currently in /root/testdata
  * gets exercised and the others rot until the next regeneration flips
  * the type back.
  */
class TablesSpec extends SparkSpec {

  // 2001-09-09T01:46:40Z plus 123456 us: exercises sub-second precision.
  private val EpochUs = 1000000000000000L + 123456L

  /** Load via Tables.events and assert the normalized contract. */
  private def assertNormalized(dir: String): Unit = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts_us").dataType === LongType)
    assert(df.schema("ts").dataType === TimestampType)
    val row = df.select(col("ts_us"), unix_micros(col("ts"))).head()
    assert(row.getLong(0) === EpochUs, "ts_us must be exact epoch micros")
    assert(row.getLong(1) === EpochUs, "normalized ts must hold the same micros")
  }

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"tables-spec-$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("long-vintage ts (raw nanos, the NANOS-parquet read) divides to micros") {
    val dir = tmp("long")
    spark.range(1).select(lit(EpochUs * 1000L).as("ts"), lit(7L).as("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assertNormalized(dir)
  }

  test("TIMESTAMP_NTZ-vintage ts converts via wall-clock diff, timezone-free") {
    val dir = tmp("ntz")
    spark.range(1)
      // TIMESTAMP -> NTZ cast uses the session tz (UTC in tests), so the
      // NTZ wall clock written here IS the UTC instant of EpochUs
      .select(timestamp_micros(lit(EpochUs)).cast(TimestampNTZType).as("ts"),
              lit(7L).as("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // the written file must actually carry NTZ, or this pins nothing
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      === TimestampNTZType)
    assertNormalized(dir)
  }

  test("tz-adjusted TIMESTAMP-vintage ts converts via unix_micros") {
    val dir = tmp("tz")
    spark.range(1)
      .select(timestamp_micros(lit(EpochUs)).as("ts"), lit(7L).as("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      === TimestampType)
    assertNormalized(dir)
  }

  test("an unrecognized ts type fails loudly instead of mis-deriving ts_us") {
    val dir = tmp("bad")
    spark.range(1).select(lit("2020-01-01").as("ts"), lit(7L).as("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported type"))
  }
}
