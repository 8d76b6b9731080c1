package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Analytics, Insights}
import graft.streaming.Streams

/** Cross-operator consistency for the round-11 family: every
  * batch/streaming twin pair must agree ROW-FOR-ROW AT FULL
  * PRECISION in one JVM — a strictly stronger check than the shared
  * DuckDB oracle (which compares each side to SQL after the canon's
  * rounding), because it catches a divergence in the un-rounded
  * digits before it ever becomes a midpoint-tie flake.
  */
class Round11ConsistencySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("c143 streaming OHLC equals batch c139 row-for-row") {
    assert(rows(Streams.streamOhlc(spark, sf)) ==
      rows(Insights.tumblingOhlc(spark, sf)))
  }

  test("c136 streaming EWMA equals batch c130 row-for-row (full double precision)") {
    assert(rows(Streams.streamEwma(spark, sf)) ==
      rows(Insights.ewmaDyadic(spark, sf)))
  }

  test("c150 streaming path counts equal batch c131 row-for-row") {
    assert(rows(Streams.streamSessionPaths(spark, sf)) ==
      rows(Insights.sessionPaths(spark, sf)))
  }

  test("c149 streaming gap histogram equals batch c145 row-for-row") {
    assert(rows(Streams.streamGapHistogram(spark, sf)) ==
      rows(Insights.gapHistogram(spark, sf)))
  }

  test("c129 closed islands + per-user opens reconstruct batch b77 exactly") {
    import org.apache.spark.sql.functions._
    val closed = Streams.streamIntervalCoalesce(spark, sf)
      .select(col("user_id"), col("istart_us"), col("iend_us"),
        col("n_events")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = Insights.intervalCoalesce(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // per user: batch n_islands == closed islands + the one open island
    val closedByUser = closed.groupBy(_._1)
    batch.foreach { case (u, (nIslands, covered, longest)) =>
      val cs = closedByUser.getOrElse(u, Array.empty)
      assert(cs.length == nIslands - 1,
        s"user $u: ${cs.length} closed vs $nIslands total")
      // every closed island's extent is bounded by the batch longest
      cs.foreach { case (_, s, e, _) => assert(e - s <= longest) }
      // closed extents never exceed the batch covered total
      assert(cs.map(c => c._3 - c._2).sum <= covered)
    }
  }

  test("windowed funnel depth never exceeds the lifetime funnel's reach") {
    // every user the 7-day-windowed funnel converts to depth 3 must be
    // counted by c74's unconstrained-lifetime purchase stage
    val windowed3 = Insights.windowFunnel(spark, sf).collect()
      .count(_.getInt(2) == 3)
    val lifetime = Analytics.funnelConversion(spark, sf).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("users")).toMap
    assert(windowed3 <= lifetime("purchase"),
      s"windowed depth-3 $windowed3 > lifetime purchase ${lifetime("purchase")}")
  }
}
