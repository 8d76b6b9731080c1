package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    * time (it is a runtime SQL conf): `events.ts` is parquet
    * INT64 TIMESTAMP(NANOS) which Spark 4.x otherwise refuses to read
    * (SURVEY §1.3, verified). With the flag, `ts` arrives as LongType
    * nanos-since-epoch; use [[events]] for the canonical µs timestamp.
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Register the codegen'd dot kernel on the session that will own
    // the plans built from this scan (idempotent) — the one seam every
    // operator passes through, so `adot` never depends on which
    // session happens to be thread-active at Column-construction time.
    graft.functions.ArrayDot.ensureRegistered(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events` with `ts` converted nanos → µs TIMESTAMP_NTZ.
    *
    * Integer division (`DIV`) is mandatory: nanos ≈ 1.7e18 exceeds
    * double's 2^53 mantissa, so `/ 1000` would corrupt low digits.
    * DuckDB reads the same file natively as µs-truncated TIMESTAMP —
    * verified byte-equal (SURVEY §1.3). Cast to TIMESTAMP_NTZ so the
    * written parquet is isAdjustedToUTC=false, matching how DuckDB
    * sees every other fixture timestamp (session TZ pinned UTC).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events").withColumn(
      "ts", timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))

  /** Canonical read: like [[t]] but with `events.ts` already converted
    * to the µs TIMESTAMP_NTZ every engine agrees on — the form all
    * cross-table operators should consume.
    */
  def canonical(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir) else t(spark, sfDir, name)
}
