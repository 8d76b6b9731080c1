package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the event-analytics kernels' semantics (ops/Analytics.scala)
  * on hand-built histories — the properties the fixture oracle can
  * agree on by coincidence are asserted here by construction.
  */
class AnalyticsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // --- c74 funnel ---------------------------------------------------

  private def funnel(rows: Seq[(Long, String, Long)]) =
    ops.Analytics.funnelConversionFrom(
      rows.toDF("user_id", "event_type", "ts_us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("c74: a click BEFORE the first view does not convert") {
    // user 1: click at t=1, view at t=2 — reached view only.
    // user 2: view 1 → click 2 → purchase 3 — full conversion.
    val out = funnel(Seq(
      (1L, "click", 1L), (1L, "view", 2L),
      (2L, "view", 1L), (2L, "click", 2L), (2L, "purchase", 3L)))
    assert(out.toSeq == Seq((1L, "view", 2L), (2L, "click", 1L),
      (3L, "purchase", 1L)))
  }

  test("c74: stage order is strict — equal timestamps do not advance") {
    // view and click at the SAME µs: strictly-after fails, no convert.
    val out = funnel(Seq((1L, "view", 5L), (1L, "click", 5L)))
    assert(out.toSeq == Seq((1L, "view", 1L), (2L, "click", 0L),
      (3L, "purchase", 0L)))
  }

  test("c74: the click must follow the EARLIEST view, not any view") {
    // click at 3 follows view at 2 (earliest view 2) — converts; the
    // purchase at 1 precedes everything and must not.
    val out = funnel(Seq(
      (1L, "purchase", 1L), (1L, "view", 2L), (1L, "click", 3L)))
    assert(out.toSeq == Seq((1L, "view", 1L), (2L, "click", 1L),
      (3L, "purchase", 0L)))
  }

  // --- c75 cohort retention ----------------------------------------

  test("c75: cohort day is the first-active day; offsets count active days once") {
    val day = 86400000000L
    // user 1 first active day 0, active again day 2 (twice — counted
    // once); user 2 first active day 2 only.
    val e = Seq(
      (1L, 0L * day + 5L), (1L, 2L * day + 1L), (1L, 2L * day + 2L),
      (2L, 2L * day + 9L)).toDF("user_id", "ts_us")
    val out = ops.Analytics.cohortRetentionFrom(e)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("1970-01-01", 0L, 1L), ("1970-01-01", 2L, 1L), ("1970-01-03", 0L, 1L)))
  }

  // --- c76 SCD2 -----------------------------------------------------

  test("c76: consecutive runs compact, intervals chain, latest is open") {
    // user 1: A,A,B,A → versions 1(A,[10,30)),2(B,[30,40)),3(A,[40,null))
    val e = Seq(
      (1L, 101L, "A", 10L), (1L, 102L, "A", 20L),
      (1L, 103L, "B", 30L), (1L, 104L, "A", 40L))
      .toDF("user_id", "event_id", "event_type", "ts_us")
    val out = ops.Analytics.scd2IntervalsFrom(e).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, "A", 10L, 30L, 2L), (2L, "B", 30L, 40L, 1L),
      (3L, "A", 40L, -1L, 1L)))
  }

  test("c76: equal-µs events break ties by event_id") {
    val e = Seq((1L, 2L, "B", 10L), (1L, 1L, "A", 10L))
      .toDF("user_id", "event_id", "event_type", "ts_us")
    val out = ops.Analytics.scd2IntervalsFrom(e).collect()
      .map(r => (r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq((1L, "A"), (2L, "B")))
  }

  // --- c81 last-touch attribution ----------------------------------

  private def attrib(rows: Seq[(Long, Long, String, Long)]) =
    ops.Analytics.lastTouchAttributionFrom(
      rows.toDF("user_id", "event_id", "event_type", "ts_us"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) null else r.getString(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))

  test("c81: credit goes to the latest prior touch; click outranks view at equal µs") {
    val day = 86400000000L
    val out = attrib(Seq(
      (1L, 1L, "view", 10L), (1L, 2L, "click", 10L), (1L, 3L, "purchase", 20L),
      (2L, 4L, "purchase", 10L), // no touch at all
      (3L, 5L, "view", 0L), (3L, 6L, "purchase", 8L * day))) // outside 7d
    assert(out.toSeq == Seq(
      (3L, "click", 10L), (4L, null, -1L), (6L, null, -1L)))
  }

  test("c81: the frame is strictly-earlier — a same-µs touch counts only via event_id order") {
    // click (event_id 1) sorts before the same-µs purchase (event_id 2)
    // → inside the 1-PRECEDING frame; reversed ids → not.
    val a = attrib(Seq((1L, 1L, "click", 5L), (1L, 2L, "purchase", 5L)))
    assert(a.toSeq == Seq((2L, "click", 0L)))
    val b = attrib(Seq((1L, 2L, "click", 5L), (1L, 1L, "purchase", 5L)))
    assert(b.toSeq == Seq((1L, null, -1L)))
  }

  // --- c82 join cardinality forecast -------------------------------

  test("c82: the forecast equals the executed join's row count, per status") {
    val sfDir = TestSpark.sf0001
    val predicted = ops.Analytics.joinCardinality(spark, sfDir)
      .select("o_orderstatus", "join_rows").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val actual = Tables.t(spark, sfDir, "orders")
      .join(Tables.t(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(predicted.filter(_._2 > 0) == actual,
      s"forecast $predicted != executed $actual")
  }

  // --- c90/c91 experiment statistics -------------------------------

  test("c90: arms partition the events; Welch dof sits in its algebraic bounds") {
    val sfDir = TestSpark.sf0001
    val rows = ops.Analytics.abWelchT(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(5),
        r.getDouble(6)))
    val total = Tables.t(spark, sfDir, "events").count()
    assert(rows.map(r => r._2 + r._3).sum == total, "arms must partition events")
    rows.foreach { case (et, na, nb, t, dof) =>
      // Welch–Satterthwaite dof ∈ [min(n_a,n_b) − 1, n_a + n_b − 2].
      assert(dof >= math.min(na, nb) - 1 - 1e-9 && dof <= na + nb - 2 + 1e-9,
        s"$et dof $dof outside [${math.min(na, nb) - 1}, ${na + nb - 2}]")
      assert(!t.isNaN && !t.isInfinite, s"$et t-stat: $t")
    }
  }

  test("c91: R² lies in [0,1] and the fit reproduces a hand-built exact line") {
    ops.Analytics.olsTrend(spark, TestSpark.sf0001).collect().foreach { r =>
      val r2 = r.getDouble(4)
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"${r.getString(0)} r2: $r2")
    }
    // Exact line y = 2x + 1 through the same moment dag → slope 2,
    // intercept 1, r2 1 (validates the closed form itself, not the
    // fixture): recompute with the oracle's arithmetic in Scala.
    val xs = Seq(0.0, 1.0, 2.0, 3.0)
    val ys = xs.map(x => 2.0 * x + 1.0)
    val (n, sx, sy) = (xs.size.toDouble, xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val syy = ys.map(b => b * b).sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    assert(num / den == 2.0 && (sy - num / den * sx) / n == 1.0)
    assert(num * num / (den * (n * syy - sy * sy)) == 1.0)
  }

  // --- c92 Kaplan–Meier --------------------------------------------

  test("c92: censored users leave the risk set without counting as churn") {
    // Users: A active days 0-2 (lifetime 2, dies), B day 0 only
    // (lifetime 0, dies), C active through the horizon day 5
    // (lifetime 5, CENSORED). Hand trace: t=0: n=3, d=1 → S=2/3;
    // t=2: n=2, d=1 → S=1/3; t=5: n=1, d=0, c=1 → S stays 1/3.
    val days = Seq(
      (1L, 0L), (1L, 1L), (1L, 2L),
      (2L, 0L),
      (3L, 0L), (3L, 5L)).toDF("user_id", "day")
    val out = ops.Analytics.kaplanMeierFrom(days).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (0L, 3L, 1L, 0L, 0.6667), (2L, 2L, 1L, 0L, 0.3333),
      (5L, 1L, 0L, 1L, 0.3333)))
  }

  test("c92: everyone dying at once drives survival to exactly zero") {
    val days = Seq((1L, 0L), (2L, 0L), (3L, 10L), (3L, 11L))
      .toDF("user_id", "day")
    // horizon = 11 → user 3 censored at t=1; users 1,2 die at t=0.
    val out = ops.Analytics.kaplanMeierFrom(days).collect()
      .map(r => (r.getLong(0), r.getDouble(4)))
    assert(out.toSeq == Seq((0L, 0.3333), (1L, 0.3333)))
    // A mixed death/censor tail keeps the curve flat after the last
    // death.
    val out2 = ops.Analytics.kaplanMeierFrom(
      Seq((1L, 0L), (2L, 0L), (2L, 3L)).toDF("user_id", "day")).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // t=0: user 1 dies (n=2) → S=0.5; t=3: user 2 censored → S=0.5.
    assert(out2.toSeq == Seq((0L, 1L, 0L, 0.5), (3L, 0L, 1L, 0.5)))
  }

  // --- c93 Markov transitions --------------------------------------

  test("c93: transitions count within users only; rows normalize to 1") {
    val e = Seq(
      (1L, 1L, "A", 10L), (1L, 2L, "B", 20L), (1L, 3L, "A", 30L),
      (2L, 4L, "A", 5L), (2L, 5L, "B", 6L))
      .toDF("user_id", "event_id", "event_type", "ts_us")
    val out = ops.Analytics.markovTransitionsFrom(e).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // A→B twice (u1, u2), B→A once (u1); no cross-user A(u1,30)→A(u2).
    assert(out.toSeq == Seq(("A", "B", 2L, 1.0), ("B", "A", 1L, 1.0)))
  }

  // --- c94 RFM -------------------------------------------------------

  test("c94: scores stay in 1..4, compose into rfm, and recency inverts") {
    val rows = ops.Analytics.rfmSegments(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (u, rec, rs, fs, ms, rfm) =>
      assert(rs >= 1 && rs <= 4 && fs >= 1 && fs <= 4 && ms >= 1 && ms <= 4,
        s"user $u scores out of range: $rs $fs $ms")
      assert(rfm == rs * 100 + fs * 10 + ms, s"user $u rfm: $rfm")
    }
    // The most-recent users (recency 0) must carry the TOP recency
    // score — the CRM inversion.
    val freshest = rows.filter(_._2 == 0L)
    assert(freshest.nonEmpty && freshest.forall(_._3 == 4L),
      s"recency-0 users not scored 4: ${freshest.take(3).toSeq}")
  }

  // --- c77 interval overlap ----------------------------------------

  test("c77: bucketized pairs equal the direct overlap join, each exactly once") {
    // Rebuild the key's pair set at sf0.001 with a brute-force quadratic
    // join over the SAME sampled intervals and demand set equality —
    // the no-loss/no-invention/no-duplicate property of the bucket trick.
    // sf0.01: the sampled sides are ~80 intervals each with 46
    // overlapping pairs (sf0.001's ~8-interval sides are vacuous).
    val sfDir = "/root/testdata/sf0.01"
    val out = ops.Analytics.intervalOverlapJoin(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == out.distinct.length, "duplicate pair emitted")
    val base = Tables.t(spark, sfDir, "orders")
      .where(substring(md5(concat(lit("ivl:"), col("o_orderkey").cast("string"))), 1, 2)
        .isin("00", "01", "02", "03"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("d"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val brute = for {
      (ak, as_, ad) <- base if as_ == "O"
      (bk, bs, bd) <- base if bs == "F"
      if ad < bd + 14 && bd < ad + 7
    } yield (ak, bk, math.min(ad + 7, bd + 14) - math.max(ad, bd))
    assert(out.toSet == brute.toSet)
    assert(out.nonEmpty, "vacuous fixture — no overlapping sampled intervals")
  }
}
