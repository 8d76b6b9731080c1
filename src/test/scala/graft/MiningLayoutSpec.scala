package graft

import java.math.RoundingMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins c79 (hard-example mining) against an independent in-JVM
  * brute force, and c80's Morton code / skipping invariants.
  */
class MiningLayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def r4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, RoundingMode.HALF_UP).doubleValue

  test("c79: operator equals an independent brute force on sf0.001") {
    val emb = Tables.t(spark, TestSpark.sf0001, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    // Same fold order as the ArrayDot kernel: sequential double acc.
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      r4(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
    val anchors = emb.filter { case (id, _, _) => md5Hex(s"anchor:$id").head == '0' }
    assert(anchors.nonEmpty)
    val expected = anchors.flatMap { case (aid, albl, ae) =>
      def top1(pred: ((Long, Int, Array[Float])) => Boolean) =
        emb.filter(v => v._1 != aid && pred(v))
          .map { case (id, lbl, e) => (id, lbl, cos(e, ae)) }
          // cos desc, vec_id asc — the operator's rank tiebreak
          .sortBy { case (id, _, c) => (-c, id) }.headOption
      for {
        (nid, nlbl, ncos) <- top1(_._2 != albl)
        (pid, _, pcos) <- top1(_._2 == albl)
      } yield (aid, albl, pid, pcos, nid, nlbl, ncos, r4(pcos - ncos))
    }.sortBy(_._1)
    val got = ops.NearDup.hardNegatives(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getInt(5), r.getDouble(6),
        r.getDouble(7)))
    assert(got.toSeq == expected.toSeq)
  }

  test("c84: quartiles interpolate and the Tukey fence counts outliers") {
    // dim 1: {1,2,3,4,100} → q1=2, med=3, q3=4, iqr=2; |100−3| > 3 → 1
    // outlier. dim 2: {10,10,10,10,10} → iqr=0; every |v−med|=0 → 0.
    // Then 4 values {0,1,2,3} in dim 3 pin the p·(n−1) interpolation:
    // q1 = 0.75, med = 1.5, q3 = 2.25.
    val emb = Seq(
      Array(1f, 10f, 0f), Array(2f, 10f, 1f), Array(3f, 10f, 2f),
      Array(4f, 10f, 3f), Array(100f, 10f, 3f))
      .toDF("embedding")
    val out = ops.NearDup.robustScalerFrom(emb).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(out(0) == ((1L, 2.0, 3.0, 4.0, 2.0, 1L)), s"dim1: ${out(0)}")
    assert(out(1) == ((2L, 10.0, 10.0, 10.0, 0.0, 0L)), s"dim2: ${out(1)}")
    // dim 3 has five values {0,1,2,3,3}: index p·4 → q1 at 1.0 → 1,
    // med at 2.0 → 2, q3 at 3.0 → 3.
    assert(out(2) == ((3L, 1.0, 2.0, 3.0, 2.0, 0L)), s"dim3: ${out(2)}")
  }

  test("c80: the Morton expression interleaves bits (px odd, sx even)") {
    def z(px: Int, sx: Int): Long =
      Seq((px, sx)).toDF("px", "sx")
        .select(expr(ops.Relational.zMortonExpr("div")).cast("long"))
        .head().getLong(0)
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 2L) // px bit 0 lands on z bit 1
    assert(z(0, 1) == 1L) // sx bit 0 lands on z bit 0
    assert(z(255, 255) == 65535L)
    // 0b10101010 / 0b01010101 → px on bits 3,7,11,15; sx on 0,4,8,12.
    assert(z(170, 85) == ((8L + 128 + 2048 + 32768) + (1L + 16 + 256 + 4096)))
  }

  test("c95: every div-1024 hilbert block is one aligned 32x32 subsquare") {
    // 1024 = 4^5, so each block of the order-8 curve must cover
    // exactly one aligned 32×32 tile — the compactness that keeps
    // min/max pruning tight. Verified on real keys.
    val rows = Tables.t(spark, TestSpark.sf0001, "lineitem")
      .select((col("l_partkey") % 256).as("q1"), (col("l_suppkey") % 256).as("q2"))
      .withColumn("z", expr(ops.Layout.hilbertKey(8)))
      .groupBy(expr("z div 1024").as("blk"))
      .agg(min("q1").as("pmin"), max("q1").as("pmax"),
        min("q2").as("smin"), max("q2").as("smax"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pmin, pmax, smin, smax) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pmin / 32 == pmax / 32 && smin / 32 == smax / 32,
        s"block ${r.getLong(0)} spans tiles: px [$pmin,$pmax] sx [$smin,$smax]")
    }
  }

  test("c80: both layouts partition the same rows; zorder never scans more than linear here") {
    val out = ops.Relational.zorderSkipping(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.map(_._1).toSeq == Seq("linear", "zorder"))
    val Seq(lin, zo) = out.toSeq
    assert(lin._5 == zo._5, "rows_matching must be layout-independent")
    assert(zo._4 <= lin._4, s"zorder scanned more than linear: $out")
    assert(zo._6 >= 1.0 && lin._6 >= 1.0, "amplification below 1 is impossible")
    // Every touched block really can contain matches: scanned ≥ matching.
    assert(zo._4 >= zo._5 && lin._4 >= lin._5)
  }
}
