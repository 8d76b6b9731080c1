package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY C10; the 100 TB brief's
  * "salting for skew" tool-kit). AQE's skew-join splitting handles
  * moderate skew automatically; these helpers are for the pathological
  * cases AQE can't fix — a single key holding >1 partition's worth of
  * rows in an aggregation, or a hot key in a shuffle join.
  *
  * Both transforms are *algebraic rewrites*: SkewSpec asserts they
  * return exactly the unsalted results. Salts are derived
  * deterministically (hash of a disambiguating column), never from
  * rand() — results must not vary run-to-run (§5.3).
  */
object Skew {

  /** Two-phase salted aggregation: spread each group over `nSalts`
    * sub-groups, partially aggregate, then merge. Works for any
    * commutative-monoid aggregate; sum/count provided concretely.
    * The first shuffle carries (key, salt) — hot keys split n ways;
    * the second shuffle is one row per (key, salt).
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
    nSalts: Int, saltBy: Column): DataFrame =
    df.withColumn("_salt", pmod(hash(saltBy), lit(nSalts)))
      .groupBy(key.as("_k"), col("_salt"))
      .agg(sum(value).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col("_k"))
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("n"))

  /** Salted shuffle join for a hot-keyed big side: the big side gets a
    * deterministic salt in [0, nSalts); the small side is replicated
    * `nSalts` times (explode of a literal range) so every (key, salt)
    * bucket finds its match. Join cardinality and results are
    * unchanged; the hot key's rows land in `nSalts` tasks instead of
    * one. Use when the "small" side is too big to broadcast but the
    * big side has hot keys.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: Column,
    smallKey: Column, nSalts: Int, saltBy: Column): DataFrame = {
    val salted = big.withColumn("_salt", pmod(hash(saltBy), lit(nSalts)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated,
        bigKey === smallKey && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
