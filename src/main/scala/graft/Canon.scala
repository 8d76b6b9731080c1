package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism canon (SURVEY §5.3): helpers that make Spark results
  * hash-match an independent DuckDB run of the equivalent SQL.
  *
  * Core rule: never emit an order-dependent double aggregate. Double
  * addition is non-associative and Spark's partial/final aggregation
  * order differs from DuckDB's single-node order — and from itself at
  * a different partition count, which also matters at 100 TB where
  * partition counts are 1000×. Sums therefore go through exact
  * DECIMAL(38,6) arithmetic and only then back to double; ratios are
  * rounded to a tolerance far above accumulated FP noise.
  */
object Canon {

  /** Exact sum: cast each element to DECIMAL(38,6) (identical
    * nearest-rounding in both engines), sum exactly, emit double.
    * Oracle mirror: `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(38, 6))).cast("double")

  /** Order-insensitive average: exact decimal sum ÷ non-null count in
    * double, rounded to 4. Oracle mirror:
    * `ROUND(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)/COUNT(x), 4)`.
    */
  def davg(c: Column): Column =
    round(sum(c.cast(DecimalType(38, 6))).cast("double") / count(c), 4)

  /** Tolerance-round for intrinsically FP quantities (stddev, corr,
    * cosine): accumulated error ~1e-12 relative, rounded at 1e-4.
    */
  def r4(c: Column): Column = round(c, 4)

  /** Exact sum at DECIMAL(38,18) — for quantities far below the
    * (38,6) grain (PageRank mass ~1/N, per-element centroid sums):
    * a 1e-6 quantum would swallow them entirely. Oracle mirror:
    * `CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)`.
    */
  def dsum18(c: Column): Column =
    sum(c.cast(DecimalType(38, 18))).cast("double")

  /** Oracle-SQL fragments mirroring the helpers above, so the pair
    * cannot drift. Usage: s"${Canon.oDsum("x")} AS total".
    */
  def oDsum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(38,6))) AS DOUBLE)"
  def oDavg(x: String): String =
    s"ROUND(CAST(SUM(CAST($x AS DECIMAL(38,6))) AS DOUBLE)/COUNT($x), 4)"
  def oDsum18(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(38,18))) AS DOUBLE)"
}
