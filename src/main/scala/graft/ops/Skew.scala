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

  /** Executor/driver budget an unconditional `broadcast()` hint must
    * provably fit before [[maybeBroadcast]] applies it. Overridable per
    * session (`spark.graft.broadcastCapBytes`) — the rehearsal corpus
    * sets it low to drive the no-hint path at test scale, and a real
    * deployment tunes it to its driver memory exactly like
    * `autoBroadcastJoinThreshold`.
    */
  private[graft] val BroadcastCapConf = "spark.graft.broadcastCapBytes"
  private[graft] val BroadcastCapDefault: Long = 256L << 20

  /** Size-aware broadcast hint for DUPLICATE-scaled build sides (loser
    * lists, shared-gram sets). These scale with corpus *duplication*,
    * not with a dimension table: on boilerplate-heavy web data the
    * c49 shared-gram set is terabyte-class, and an unconditional
    * `broadcast()` hint then breaches Spark's 8 GiB broadcast limit
    * outright where AQE would have picked a shuffle join.
    *
    * The hint is applied only when `boundRows * rowBytes` — a cheap
    * UPPER BOUND from an already-materialized table (gram-table rows,
    * label-table rows, corpus count), never a re-execution of the
    * aggregate being hinted — fits under the cap, making the broadcast
    * provably safe. Over the cap the frame is returned unhinted and
    * AQE decides at runtime: if the actual set turns out small, AQE
    * converts the shuffle join back to a broadcast join on measured
    * sizes, so a loose bound costs one shuffle stage of a
    * duplicate-sized table, never an OOM — the hint is an
    * optimization, not a correctness cliff.
    *
    * The cap is read from the CALLING session (not `df.sparkSession`):
    * frames derived from the per-application memoized tables are bound
    * to whichever session first materialized them, and the cap is a
    * property of the query being planned, not of the cache.
    */
  def maybeBroadcast(df: DataFrame, boundRows: Long, rowBytes: Long,
      session: org.apache.spark.sql.SparkSession): DataFrame = {
    // Parsed with the same byte-string parser Spark's own size confs
    // use, so "256m"/"1g" — the idiom of the analogous
    // autoBroadcastJoinThreshold — work instead of throwing a lazy
    // NumberFormatException at plan time of every hinted query.
    val cap = session.conf.getOption(BroadcastCapConf)
      .map(v => try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)
        catch { case e: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$BroadcastCapConf='$v' is not a byte size (use e.g. 268435456, '256m', '1g')", e)
        })
      .getOrElse(BroadcastCapDefault)
    if (rowBytes > 0 && boundRows <= cap / rowBytes) broadcast(df) else df
  }
}
