package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT cumulative counts / global ranks — the two-pass
  * order-statistic kernel that makes c94's scaladoc rule ("never a
  * global ntile / partition-less rank over unbounded data") hold for
  * the exact-rank family (c137, c148, c151) without changing a single
  * output value:
  *
  *   1. value-range bucketing: [[RankBuckets]] shards from a per-group
  *      broadcast (min, max). The bucket map is deterministic and
  *      MONOTONE (a double cast of the order key; casting is
  *      order-preserving, so bucket(v1) <= bucket(v2) whenever
  *      v1 < v2, and ties never split across buckets);
  *   2. per-(group, bucket) totals — map-side combined; at most
  *      [[RankBuckets]] rows per group cross the wire;
  *   3. bucket OFFSETS via a running sum over that <= B-row side
  *      table — the whitelisted "group-sized window" class (its input
  *      is bounded by the constant B, never by the data);
  *   4. within-bucket running counts — a window whose partitions are
  *      value-range shards (~ n/B rows each): a genuinely distributed
  *      sort, never "move everything to one task".
  *
  * `cum_le(row) = offset(bucket) + running count within bucket` is the
  * EXACT inclusive rank of the row under (v, tie...): identical to
  * `row_number().over(Window.orderBy(v, tie...))` when every cnt is 1,
  * and to the inclusive cumulative frequency when rows are
  * (value, count) tallies. Callers keep their rank-`floor((n-1)p)+1`
  * order-statistic semantics AND their DuckDB oracles unchanged — only
  * the physical plan changes.
  *
  * Degenerate skew: if every value is equal, all rows land in bucket 0
  * and step 4 collapses to one partition — but an all-equal column has
  * no ordering work to distribute in the first place; real corpora
  * spread across the range. At 100 TB raise B with the cluster — the
  * algebra is B-invariant.
  *
  * CONTRACT — non-null `v` and `grp` keys (round-12 ADVICE): the
  * kernel is bit-identical to the window form only for rows whose
  * order key and group keys are NON-NULL. A NULL `v` makes
  * `floor(null)` NULL and `least(null, B−1)` pick B−1 (Spark's least
  * skips nulls), routing the row to the LAST bucket while a window's
  * NULLS FIRST sort ranks it FIRST; a NULL group key is dropped by
  * the inner bounds join where `partitionBy` would keep it. A
  * schema-level `require(!nullable)` would false-reject every parquet
  * read (Spark marks parquet columns nullable regardless of data), so
  * the precondition is contractual: callers must filter or coalesce
  * null keys first. Every current caller passes md5-derived, counted,
  * or fixture-non-null keys; a new caller with nullable semantics
  * must decide where nulls rank and encode that BEFORE the kernel.
  *
  * COST — the input appears ~3× in the plan (bounds aggregate,
  * per-bucket totals, within-bucket window), and round 14 PRICED what
  * that actually costs (graft.PersistPrice; SCALE.md round 14): for
  * any upstream whose tail is an EXCHANGE (groupBy / join — the
  * "expensive pipeline" class round 12 worried about), Spark reuses
  * the upstream's shuffle stages across all three references inside
  * the one rank query, so the unpersisted 3-pass run costs ≈ ONE
  * evaluation — measured at 100× docs: a bigram-explode ⋈ token-tally
  * upstream ran the full unpersisted rank in 22.9 s while a SINGLE
  * standalone evaluation of the same upstream took 26.1 s, and
  * MEMORY_AND_DISK persist made it SLOWER (25.9 s; +108% on the
  * tally-grade upstream, 3.1 s vs 1.5 s) by paying a cache write and
  * pinning the post-AQE low-parallelism layout. So: DO NOT persist
  * exchange-terminated inputs. The one genuinely recomputed class is
  * a purely NARROW expensive upstream (a per-row kernel projection
  * over a scan, no shuffle at its tail — 3 real kernel passes);
  * arithmetic prices that trade (3× kernel CPU vs one cache write of
  * the projected columns), and such callers may persist after
  * measuring. Every current caller passes a key-sized tally or a
  * single-scan projection — none persists, now by measurement rather
  * than estimate.
  */
private[graft] object OrderStats {

  /** Bucket count: 1024 shards keeps the offset side table tiny
    * (<= 1024 rows per group, broadcast) while bounding within-bucket
    * partitions at ~ n/1024.
    */
  private[graft] val RankBuckets = 1024

  /** Appends `cum_le` — the exact inclusive cumulative count (the
    * global rank when every `cnt` is 1) ordered by (`v`, `tie...`)
    * within each `grp` combination. `df` must carry a numeric order
    * key `v` and a long count `cnt`; `grp` must be low-cardinality
    * (its per-group bounds broadcast).
    */
  def cumLe(df: DataFrame, grp: Seq[String], tie: Seq[String]): DataFrame =
    cumSums(df, grp, tie, Seq("cnt"))
      .withColumnRenamed("cum_cnt", "cum_le")

  /** The general two-pass kernel: appends `cum_<m>` — the exact
    * INCLUSIVE running sum of each measure column `m` over the
    * (`v`, `tie...`) total order within each `grp` combination.
    * Counts give ranks ([[cumLe]]); an exact-decimal delta column
    * gives a distributed PREFIX SUM (the c113 CUSUM shape) — decimal
    * addition is associative, so chunk-offset assembly is
    * bit-identical to the sequential window. Measures may be long or
    * decimal; doubles are rejected by design (a double prefix sum is
    * order-dependent and has no distributed exact form).
    */
  def cumSums(df: DataFrame, grp: Seq[String], tie: Seq[String],
      measures: Seq[String]): DataFrame = {
    require(measures.nonEmpty, "at least one measure column")
    measures.foreach { m =>
      require(!df.schema(m).dataType.isInstanceOf[org.apache.spark.sql.types.DoubleType]
          && !df.schema(m).dataType.isInstanceOf[org.apache.spark.sql.types.FloatType],
        s"measure $m is floating-point: a distributed prefix sum is only " +
          "exact for integer/decimal measures")
    }
    def zero(m: String) = lit(0).cast(df.schema(m).dataType)
    val vd = col("v").cast("double")
    val bounds =
      if (grp.isEmpty) df.agg(min(vd).as("blo"), max(vd).as("bhi"))
      else df.groupBy(grp.map(col): _*).agg(min(vd).as("blo"), max(vd).as("bhi"))
    val withBounds =
      if (grp.isEmpty) df.crossJoin(broadcast(bounds))
      else df.join(broadcast(bounds), grp)
    // +1e-9 denominator guard: an all-equal group has bhi - blo = 0 and
    // the unguarded ratio is NaN; with the guard every row lands in
    // bucket 0 (the b52/c28 epsilon discipline). The epsilon is
    // negligible against any real range and cannot break monotonicity.
    val bucketed = withBounds.withColumn("bucket",
      least(floor((vd - col("blo")) / (col("bhi") - col("blo") + lit(1e-9)) *
          RankBuckets).cast("long"),
        lit(RankBuckets - 1L)))
      .drop("blo", "bhi")
    val bucketTotals = bucketed
      .groupBy((grp :+ "bucket").map(col): _*)
      .agg(sum(col(measures.head)).as(s"bn_${measures.head}"),
        measures.tail.map(m => sum(col(m)).as(s"bn_$m")): _*)
    // Offsets over the <= B-row bucket table. Grouped callers ride a
    // running-sum window partitioned by grp — <= B rows per partition
    // BY CONSTRUCTION, never data-sized, and the non-empty
    // partitionSpec keeps the §5.3 rule 9 sweep clean. Global callers
    // (grp empty) CANNOT use a window without tripping the rule (a
    // lit-constant partition column folds away in the optimizer, and
    // the sweep rightly sees a partition-less WindowExec), so they
    // keep the c28 b.bucket < a.bucket self-join — ~B²/2 nested-loop
    // rows, constant-bounded.
    val offsets =
      if (grp.nonEmpty) {
        val wOff = Window.partitionBy(grp.map(col): _*)
          .orderBy(col("bucket").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        bucketTotals.select(
          (grp :+ "bucket").map(col) ++ measures.map(m =>
            coalesce(sum(col(s"bn_$m")).over(wOff), zero(m)).as(s"boff_$m")): _*)
      } else {
        val offCols = measures.map(m =>
          coalesce(sum(col(s"b.bn_$m")), zero(m)).as(s"boff_$m"))
        bucketTotals.as("a")
          .join(bucketTotals.as("b"), col("b.bucket") < col("a.bucket"), "left")
          .groupBy(col("a.bucket").as("bucket"))
          .agg(offCols.head, offCols.tail: _*)
      }
    val wIn = Window.partitionBy((grp :+ "bucket").map(col): _*)
      .orderBy(("v" +: tie).map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withIn = measures.foldLeft(bucketed) { (d, m) =>
      d.withColumn(s"cumin_$m", sum(col(m)).over(wIn))
    }
    val joined = withIn.join(broadcast(offsets), grp :+ "bucket")
    measures.foldLeft(joined) { (d, m) =>
      d.withColumn(s"cum_$m", col(s"boff_$m") + col(s"cumin_$m"))
        .drop(s"cumin_$m", s"boff_$m")
    }.drop("bucket")
  }
}
