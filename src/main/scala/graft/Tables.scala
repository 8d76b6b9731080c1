package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture table access (SURVEY §1.3).
  *
  * All runnable sources are parquet under a scale-factor directory
  * (`/root/testdata/sf*`). At 100 TB the same reader works unchanged:
  * `spark.read.parquet` scans are split by file/rowgroup, filters and
  * projections are pushed into the vectorized reader, and partition
  * count scales with input size — nothing here assumes a single file.
  */
object Tables {

  /** Every fixture table name (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one fixture table.
    *
    * Sets `spark.sql.legacy.parquet.nanosAsLong` defensively at read
    * time (it is a runtime SQL conf): an INT64 TIMESTAMP(NANOS)
    * `events.ts` vintage (pre-round-10 fixtures) is unreadable in
    * Spark 4.x without it, arriving as LongType nanos with it; the
    * round-10 native-µs vintage ignores the flag. Use [[events]] /
    * [[tsTimestamp]] for the vintage-independent timestamp.
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Register the codegen'd dot kernel on the session that will own
    // the plans built from this scan (idempotent) — the one seam every
    // operator passes through, so `adot` never depends on which
    // session happens to be thread-active at Column-construction time.
    graft.functions.ArrayDot.ensureRegistered(spark)
    graft.functions.EditDistance.ensureRegistered(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events.ts` normalized to a session-TZ TIMESTAMP at µs
    * resolution, branched on the dtype the scan actually produced —
    * the driver fixtures have shipped the column in two vintages:
    *
    *  - raw INT64 TIMESTAMP(NANOS): arrives as LongType nanos under
    *    the nanosAsLong conf; integer `DIV 1000` is mandatory (nanos
    *    ≈ 1.7e18 exceeds double's 2^53 mantissa, `/ 1000` would
    *    corrupt low digits), then `timestamp_micros`.
    *  - native TIMESTAMP(MICROS) isAdjustedToUTC=false (round 10
    *    regeneration): arrives as TIMESTAMP_NTZ; the ntz→timestamp
    *    cast is exact because every session pins UTC (Sessions.scala,
    *    TestSpark) — DuckDB reads the same file as naive TIMESTAMP,
    *    so both engines see identical instants either way (verified
    *    via scripts/check.py on all ts-bearing keys).
    *
    * Branching on the READ dtype (not the path) keeps every consumer
    * correct against either vintage without re-coding the sites.
    */
  def tsTimestamp(ev: DataFrame): Column = ev.schema("ts").dataType match {
    case LongType => timestamp_micros(expr("ts DIV 1000"))
    case org.apache.spark.sql.types.TimestampNTZType => col("ts").cast("timestamp")
    case org.apache.spark.sql.types.TimestampType => col("ts")
    // A THIRD vintage must fail here, loudly and by name — a silent
    // pass-through would hand consumers values off by TZ semantics or
    // a unit factor and only surface as oracle hash mismatches.
    case other => throw new IllegalStateException(
      s"events.ts arrived as $other — unknown fixture vintage; " +
        "extend Tables.tsTimestamp for it (see FIXTURES.md)")
  }

  /** `events.ts` as epoch-µs LONG (the canon total-order key for
    * window specs), dtype-branched like [[tsTimestamp]].
    */
  def tsUs(ev: DataFrame): Column = ev.schema("ts").dataType match {
    case LongType => expr("ts DIV 1000")
    case _ => unix_micros(tsTimestamp(ev))
  }

  /** `events.ts` as µs TIMESTAMP_NTZ — the form the written parquet
    * must carry (isAdjustedToUTC=false) so DuckDB sees it like every
    * other fixture timestamp (session TZ pinned UTC).
    */
  def tsNtz(ev: DataFrame): Column = tsTimestamp(ev).cast("timestamp_ntz")

  /** `events` with `ts` already normalized per [[tsNtz]]. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    ev.withColumn("ts", tsNtz(ev))
  }

  /** Canonical read: like [[t]] but with `events.ts` already converted
    * to the µs TIMESTAMP_NTZ every engine agrees on — the form all
    * cross-table operators should consume.
    */
  def canonical(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir) else t(spark, sfDir, name)
}
