package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Bucketing pre-pays the join shuffle: two tables bucketed on the
  * join key must join with no Exchange on either side.
  */
class LayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("bucketed-by-key tables join without a shuffle") {
    val orders = Tables.t(spark, TestSpark.sf0001, "orders")
    val lineitem = Tables.t(spark, TestSpark.sf0001, "lineitem")
    Layout.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    Layout.writeBucketed(lineitem, "lineitem_b", "l_orderkey", 4)
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == lineitem.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("clusterBy produces the requested partitioning and local order") {
    val df = Layout.clusterBy(
      Tables.t(spark, TestSpark.sf0001, "orders"), "o_custkey", 8, "o_orderdate")
    assert(df.rdd.getNumPartitions == 8)
    // within every partition, keys are grouped (sorted) — verify on one
    import spark.implicits._
    val firstPart = df.select($"o_custkey").rdd
      .mapPartitionsWithIndex { case (i, it) => if (i == 0) it else Iterator.empty }
      .map(_.getLong(0)).collect()
    assert(firstPart.sameElements(firstPart.sorted))
  }

  test("hive-partitioned writes enable partition pruning at read") {
    val out = "/tmp/graft_partitioned_docs"
    Tables.t(spark, TestSpark.sf0001, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val pruned = spark.read.parquet(out).where(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("isnotnull(lang"),
      s"no partition pruning in:\n$plan")
    // pruned scan must list only the lang=en directory
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("lang=de"), "scan not pruned to lang=en")
  }

  test("zorderBy gives compact per-partition bounding boxes in BOTH dims") {
    val orders = Tables.t(spark, TestSpark.sf0001, "orders")
    def avgRelRanges(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df.select(col("o_custkey").cast("double").as("x"),
          col("o_totalprice").cast("double").as("y"))
        .withColumn("p", spark_partition_id())
        .groupBy("p").agg((max("x") - min("x")).as("rx"), (max("y") - min("y")).as("ry"))
        .agg(avg("rx").as("arx"), avg("ry").as("ary")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val g = orders.agg(
      (max("o_custkey") - min("o_custkey")).cast("double"),
      (max("o_totalprice") - min("o_totalprice")).cast("double")).head()
    val (gx, gy) = (g.getDouble(0), g.getDouble(1))
    val z = Layout.zorderBy(orders, "o_custkey", "o_totalprice", 16)
    assert(z.count() == orders.count(), "zorder must be a pure re-layout")
    val (zx, zy) = avgRelRanges(z)
    // z-curve segments stay compact in BOTH dims (ideal for 16
    // partitions of an 8-bit grid: ~1/4 of each range)
    assert(zx / gx < 0.6 && zy / gy < 0.6,
      f"z-order boxes not compact: x=${zx / gx}%.2f y=${zy / gy}%.2f of global")
    // contrast: a single-dim range sort leaves the other dim unclustered
    val (_, sy) = avgRelRanges(orders.repartitionByRange(16, col("o_custkey")))
    assert(sy / gy > 0.7,
      f"expected single-dim layout to span ~full y range, got ${sy / gy}%.2f")
  }

  test("hilbert key is a bijective unit-step walk of the full grid") {
    import spark.implicits._
    val bits = 4
    val n = 1 << bits
    // All 256 cells of the 16x16 grid through the production expression.
    val cells = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("q1", "q2")
      .withColumn("d", org.apache.spark.sql.functions.expr(Layout.hilbertKey(bits)))
      .select("d", "q1", "q2").as[(Long, Long, Long)].collect().sortBy(_._1)
    // Bijection: every index in [0, n^2) exactly once.
    assert(cells.map(_._1).toSeq == (0L until (n.toLong * n)).toSeq)
    // Hilbert continuity: consecutive indices are grid NEIGHBOURS —
    // the locality property Morton interleaving lacks (its seams jump
    // across the grid). This pins the rotation logic exactly: any bit
    // error breaks adjacency somewhere in the walk.
    cells.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) == 1,
        s"non-adjacent step ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("hilbertLayers: the unrolled flat-column walk is bit-identical to the HOF fold on the full grid") {
    // Round 16 swapped the hot path (c95, hilbertBy) from the
    // named_struct aggregate fold to codegen'd per-level CASE columns;
    // this pins the two forms equal on every cell at the production
    // order (any divergence breaks the cross-engine hash, so it must
    // fail HERE first).
    import org.apache.spark.sql.functions.{expr, sum}
    val bits = 8
    val grid = spark.range(0L, 1L << (2 * bits)).selectExpr(
      s"id div ${1 << bits} AS q1", s"id % ${1 << bits} AS q2")
    // Compare via an AGGREGATE, not a row filter on z: a filter
    // directly above the unrolled layers is exactly the consumer
    // shape withHilbertZ's scaladoc forbids (predicate substitution
    // expands ~5x per projection hop — the optimizer runs for
    // minutes; found the hard way by this test's first version).
    val mismatches = Layout.withHilbertZ(grid, bits, "z")
      .withColumn("d_fold", expr(Layout.hilbertKey(bits)))
      .selectExpr("CAST(z != d_fold AS INT) AS m")
      .agg(sum("m")).collect().head.getLong(0)
    assert(mismatches == 0, "unrolled Hilbert walk diverged from the fold")
  }

  test("hilbertBy gives compact per-partition bounding boxes in BOTH dims") {
    val orders = Tables.t(spark, TestSpark.sf0001, "orders")
    val h = Layout.hilbertBy(orders, "o_custkey", "o_totalprice", 16)
    assert(h.count() == orders.count(), "hilbert must be a pure re-layout")
    val r = h.select(col("o_custkey").cast("double").as("x"),
        col("o_totalprice").cast("double").as("y"))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg((max("x") - min("x")).as("rx"), (max("y") - min("y")).as("ry"))
      .agg(avg("rx").as("arx"), avg("ry").as("ary")).head()
    val g = orders.agg(
      (max("o_custkey") - min("o_custkey")).cast("double"),
      (max("o_totalprice") - min("o_totalprice")).cast("double")).head()
    assert(r.getDouble(0) / g.getDouble(0) < 0.6 && r.getDouble(1) / g.getDouble(1) < 0.6,
      f"hilbert boxes not compact: x=${r.getDouble(0) / g.getDouble(0)}%.2f y=${r.getDouble(1) / g.getDouble(1)}%.2f")
  }

  test("runtime bloom-filter pruning injects on a selective shuffle join") {
    // At 100 TB the win: a selective dimension filter becomes a bloom
    // filter evaluated inside the fact scan, discarding rows before
    // the shuffle instead of after it. Thresholds are tuned for prod
    // sizes, so pin the mechanism by scaling them down to fixture size
    // (and disabling broadcast so the join actually shuffles).
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1B",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = Tables.t(spark, TestSpark.sf0001, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
      val lineitem = Tables.t(spark, TestSpark.sf0001, "lineitem")
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter injected:\n$plan")
      assert(joined.count() > 0)
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("writeSized caps records per output file") {
    val out = "/tmp/graft_layout_test"
    Layout.writeSized(Tables.t(spark, TestSpark.sf0001, "orders"), out, 500L)
    val files = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files >= 3, s"expected >=3 files of <=500 rows for 1500 rows, got $files")
  }
}
