package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The events.ts vintage branch (round 10): the fixtures have shipped
  * `ts` both as INT64 nanos (read as LongType under nanosAsLong) and
  * as native µs (read as TIMESTAMP_NTZ). `Tables.tsTimestamp/tsUs/
  * tsNtz` must produce identical values for the same instant from
  * either physical form — this is the guard that a future vintage
  * flip fails HERE, not as 20 analysis errors across the suite.
  */
class TablesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // One instant, two vintages: 2026-03-01T12:34:56.789012345 UTC.
  private val nanos = 1772368496789012345L
  private val micros = nanos / 1000L // 1772368496789012

  private def nsFrame = Seq((1L, nanos)).toDF("event_id", "ts")
  private def usFrame = Seq((1L, micros)).toDF("event_id", "us")
    .select(col("event_id"), timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))

  test("tsUs: both vintages yield the same epoch-µs long") {
    val fromNs = nsFrame.select(Tables.tsUs(nsFrame).as("u")).as[Long].head()
    val fromUs = usFrame.select(Tables.tsUs(usFrame).as("u")).as[Long].head()
    assert(fromNs == micros && fromUs == micros)
  }

  test("tsNtz: both vintages yield the same TIMESTAMP_NTZ micros") {
    val a = nsFrame.select(unix_micros(Tables.tsNtz(nsFrame).cast("timestamp")).as("u"))
      .as[Long].head()
    val b = usFrame.select(unix_micros(Tables.tsNtz(usFrame).cast("timestamp")).as("u"))
      .as[Long].head()
    assert(a == micros && b == micros)
  }

  test("tsTimestamp: the ns vintage truncates (not rounds) to µs") {
    // …789012345 ns must become …789012 µs — DIV truncation, matching
    // DuckDB's ns→µs truncation on read. A float division would round
    // up to …789013 (low-digit corruption at 1.7e18 > 2^53).
    val v = nsFrame.select(unix_micros(Tables.tsTimestamp(nsFrame)).as("u")).as[Long].head()
    assert(v == micros)
    assert(v % 1000 == 12L) // the truncated tail survives exactly
  }

  test("the fixture on disk reads through the helpers without analysis errors") {
    for (sf <- Seq(TestSpark.sf0001, TestSpark.sf001)) {
      val n = Tables.events(spark, sf)
        .where(col("ts").isNotNull).count()
      assert(n > 0, s"no events at $sf")
    }
  }
}
