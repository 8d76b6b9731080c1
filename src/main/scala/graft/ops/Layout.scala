package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout-at-rest tools (SURVEY §1.1: Cassandra's partition-key
  * + clustering layout IS Spark's bucket + sortWithinPartitions
  * contract; the brief's "bucketing for co-located joins").
  *
  * Bucketing pre-pays the shuffle once at write time: two tables
  * bucketed by the same key into the same bucket count join with NO
  * exchange on either side — at 100 TB that's the difference between
  * re-shuffling the fact table per query and never shuffling it.
  * LayoutSpec asserts the exchange-free plan.
  */
object Layout {

  /** Write a frame bucketed (and sorted) by key — the Cassandra
    * "partition key + clustering column" layout on parquet. Requires
    * a table name (bucket metadata lives in the catalog).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
    buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    sortCol.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  /** Re-layout a frame for a downstream co-located merge: hash
    * repartition on the key + sort within partitions — the in-flight
    * equivalent of [[writeBucketed]] for single-job pipelines.
    */
  def clusterBy(df: DataFrame, key: String, partitions: Int,
    sortCols: String*): DataFrame =
    df.repartition(partitions, col(key))
      .sortWithinPartitions((key +: sortCols).map(col): _*)

  /** Size-bounded output files (the small-files defence): cap rows per
    * file and coalesce tiny outputs — at 100 TB, file-count hygiene is
    * a first-class operator.
    */
  def writeSized(df: DataFrame, path: String, maxRecordsPerFile: Long): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Z-order (Morton) clustering on two numeric columns: quantize each
    * to `bits` bits, interleave the bits into one key, range-partition
    * and sort by it. Files then have COMPACT min/max bounding boxes in
    * BOTH dimensions, so parquet row-group statistics prune 2-D
    * predicates — a single-column sort gives perfect pruning on one
    * dimension and none on the other. This is the lakehouse layout
    * trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) expressed as plain
    * DataFrame algebra.
    *
    * Scale posture: quantization bounds come from a broadcast 1-row
    * aggregate (no collect); `repartitionByRange` samples the z-key —
    * one extra pass, no driver-side data.
    */
  def zorderBy(df: DataFrame, c1: String, c2: String,
    partitions: Int, bits: Int = 8): DataFrame = {
    val bounds = df.agg(
      min(col(c1)).cast("double").as("min1"), max(col(c1)).cast("double").as("max1"),
      min(col(c2)).cast("double").as("min2"), max(col(c2)).cast("double").as("max2"))
    val scale = (1 << bits) - 1
    def quant(c: String, lo: String, hi: String) =
      least(greatest(
        floor((col(c).cast("double") - col(lo)) /
          (col(hi) - col(lo) + lit(1e-12)) * scale).cast("long"),
        lit(0L)), lit(scale.toLong))
    val keyed = df.crossJoin(broadcast(bounds))
      .withColumn("q1", quant(c1, "min1", "max1"))
      .withColumn("q2", quant(c2, "min2", "max2"))
      .withColumn("zkey", (0 until bits).foldLeft(lit(0L)) { (acc, j) =>
        acc.bitwiseOR(shiftleft(shiftright(col("q1"), j).bitwiseAND(lit(1L)), 2 * j))
          .bitwiseOR(shiftleft(shiftright(col("q2"), j).bitwiseAND(lit(1L)), 2 * j + 1))
      })
    keyed.repartitionByRange(partitions, col("zkey"))
      .sortWithinPartitions("zkey")
      .drop("min1", "max1", "min2", "max2", "q1", "q2", "zkey")
  }

  /** The Hilbert index of quantized cells (`q1`, `q2`) ∈ [0, 2^bits)²,
    * as a SQL expression string. Classic bit-level walk (d += s²·((3·rx)
    * XOR ry), then flip+swap rotation when ry = 0) executed as an
    * `aggregate` higher-order function over the bit levels: the loop
    * runs at RUNTIME over a (x, y, d) struct accumulator, so the
    * expression stays constant-size — a naive per-level Column fold
    * would inline the rotation state exponentially (x and y each feed
    * both successors). The flip uses n−1−v: it differs from the
    * textbook 2s−1−v only in bits the remaining levels never read, and
    * stays non-negative.
    */
  /** The Hilbert walk UNROLLED into flat per-level column expressions
    * (round 16): [[hilbertKey]]'s higher-order `aggregate` fold with
    * per-row named_struct state does not fully whole-stage-codegen —
    * measured 6.1 cpu-s over 6M rows at sf0.1 on c95 — while the same
    * arithmetic as `bits` layers of plain-long CASEs is ordinary
    * codegen'd projection (the oracle already unrolls the identical
    * walk into per-level CTEs; this is the Spark twin of that text,
    * same integer ops, bit-identical keys). Apply with
    * [[withHilbertZ]].
    */
  private[graft] def hilbertLayers(bits: Int, out: String): Seq[Seq[(String, String)]] = {
    val nm1 = (1L << bits) - 1
    val init = Seq(
      s"${out}_hx_0" -> "CAST(q1 AS BIGINT)",
      s"${out}_hy_0" -> "CAST(q2 AS BIGINT)",
      s"${out}_hd_0" -> "CAST(0 AS BIGINT)")
    val steps = (1 to bits).map { i =>
      val s = 1L << (bits - i)
      val px = s"${out}_hx_${i - 1}"
      val py = s"${out}_hy_${i - 1}"
      val rx = s"(CASE WHEN ($px & $s) != 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN ($py & $s) != 0 THEN 1 ELSE 0 END)"
      Seq(
        s"${out}_hx_$i" -> (s"CASE WHEN $ry = 0 THEN " +
          s"CASE WHEN $rx = 1 THEN $nm1 - $py ELSE $py END ELSE $px END"),
        s"${out}_hy_$i" -> (s"CASE WHEN $ry = 0 THEN " +
          s"CASE WHEN $rx = 1 THEN $nm1 - $px ELSE $px END ELSE $py END"),
        s"${out}_hd_$i" ->
          s"${out}_hd_${i - 1} + ${1L << (2 * (bits - i))} * ((3 * $rx) ^ $ry)")
    }
    Seq(init) ++ steps
  }

  /** `df` + Hilbert index column `out` computed from (q1, q2) via the
    * unrolled layers; intermediates dropped. Measured 10× the fold on
    * 6M rows (0.53 vs 5.3 s warm).
    *
    * CONSUMER CONTRACT: aggregate on `out`, group by it, or
    * repartition/sort by it — do NOT put a row FILTER directly on
    * `out` above these layers. Predicate pushdown substitutes the
    * layer expressions hop by hop (each level references the previous
    * one ~5×), so a filter's condition expands ~5^levels and the
    * optimizer runs for minutes. Both in-repo consumers (c95's
    * groupBy audit, hilbertBy's range repartition) are the safe
    * shapes — pinned by the LayoutSpec bit-identity test, whose first
    * version hit the filter explosion. If a filtered consumer is ever
    * needed, materialize the keyed frame first (persist/checkpoint)
    * so the filter lands on a scan, not the layer stack.
    */
  private[graft] def withHilbertZ(df: DataFrame, bits: Int, out: String): DataFrame = {
    val layers = hilbertLayers(bits, out)
    val folded = layers.foldLeft(df) { (d, layer) =>
      d.selectExpr("*" +: layer.map { case (a, e) => s"$e AS $a" }: _*)
    }
    folded.withColumn(out, col(s"${out}_hd_$bits"))
      .drop(layers.flatten.map(_._1): _*)
  }

  private[graft] def hilbertKey(bits: Int): String = {
    val nm1 = (1L << bits) - 1
    val s = s"shiftleft(CAST(1 AS BIGINT), $bits - i)"
    val rx = s"CASE WHEN (a.x & $s) != 0 THEN 1 ELSE 0 END"
    val ry = s"CASE WHEN (a.y & $s) != 0 THEN 1 ELSE 0 END"
    s"""aggregate(
       |  sequence(1, $bits),
       |  named_struct('x', q1, 'y', q2, 'd', CAST(0 AS BIGINT)),
       |  (a, i) -> named_struct(
       |    'x', CASE WHEN $ry = 0
       |           THEN CASE WHEN $rx = 1 THEN $nm1 - a.y ELSE a.y END
       |           ELSE a.x END,
       |    'y', CASE WHEN $ry = 0
       |           THEN CASE WHEN $rx = 1 THEN $nm1 - a.x ELSE a.x END
       |           ELSE a.y END,
       |    'd', a.d + shiftleft(CAST(1 AS BIGINT), 2 * ($bits - i)) * ((3 * $rx) ^ $ry)),
       |  a -> a.d)""".stripMargin
  }

  /** Hilbert-curve clustering on two numeric columns — [[zorderBy]]
    * with the Morton interleave swapped for the Hilbert index. Same
    * cost (one broadcast bounds row, one range partitioning), strictly
    * better locality: consecutive Hilbert cells are always grid
    * neighbours (unit steps, no Morton "seams"), so range-partitioned
    * files cover tighter 2-D bounding boxes and parquet min/max
    * pruning discards more row groups for box predicates.
    */
  def hilbertBy(df: DataFrame, c1: String, c2: String,
    partitions: Int, bits: Int = 8): DataFrame = {
    val bounds = df.agg(
      min(col(c1)).cast("double").as("min1"), max(col(c1)).cast("double").as("max1"),
      min(col(c2)).cast("double").as("min2"), max(col(c2)).cast("double").as("max2"))
    val scale = (1 << bits) - 1
    def quant(c: String, lo: String, hi: String) =
      least(greatest(
        floor((col(c).cast("double") - col(lo)) /
          (col(hi) - col(lo) + lit(1e-12)) * scale).cast("long"),
        lit(0L)), lit(scale.toLong))
    withHilbertZ(
      df.crossJoin(broadcast(bounds))
        .withColumn("q1", quant(c1, "min1", "max1"))
        .withColumn("q2", quant(c2, "min2", "max2")),
      bits, "hkey")
      .repartitionByRange(partitions, col("hkey"))
      .sortWithinPartitions("hkey")
      .drop("min1", "max1", "min2", "max2", "q1", "q2", "hkey")
  }
}
