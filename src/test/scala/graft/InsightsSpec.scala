package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Insights

/** Property checks for the round-11 decision-analytics family —
  * brute-force re-derivations in plain Scala at sf0.001 (the specs
  * may collect; operators never do) plus the algebraic invariants
  * each operator's contract promises.
  */
class InsightsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private lazy val events: Seq[(Long, Long, String, Double, Long)] = {
    val ev = Tables.t(spark, sf, "events")
    ev.select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), Tables.tsUs(ev).as("ts_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4))).toSeq
  }

  test("b77: islands match a per-user brute-force interval merge") {
    val got = Insights.intervalCoalesce(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val exp = events.groupBy(_._1).map { case (u, es) =>
      val iv = es.map(e => (e._5, e._5 + Insights.IntervalUs))
        .sortBy(identity)
      val islands = iv.tail.foldLeft(List(iv.head)) {
        case ((cs, ce) :: rest, (s, e)) =>
          if (s <= ce) (cs, math.max(ce, e)) :: rest
          else (s, e) :: (cs, ce) :: rest
        case (Nil, x) => List(x)
      }
      val lens = islands.map { case (s, e) => e - s }
      u -> ((islands.size.toLong, lens.sum, lens.max))
    }
    assert(got == exp)
  }

  test("b78: spine is gap-free per user and fill carries the last close") {
    val rows = Insights.resampleFfill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byUser = rows.groupBy(_._1)
    // last close at-or-before each day, from the raw events
    val closes = events.groupBy(e => (e._1, e._5 / 86400000000L))
      .map { case (k, es) => k -> es.maxBy(e => (e._5, e._2))._4 }
    byUser.foreach { case (u, rs) =>
      val days = rs.map(_._2).sorted
      assert(days.toSeq == (days.head to days.last).toSeq,
        s"user $u spine has gaps")
      rs.foreach { case (_, d, v, obs) =>
        val expected = (days.head to d).reverse
          .flatMap(dd => closes.get((u, dd))).headOption
        assert(expected.contains(v), s"user $u day $d fill $v != $expected")
        assert((obs == 1) == closes.contains((u, d)))
      }
    }
  }

  test("c121: sketch union mergeability — k-min of union == k-min of merged sketches") {
    val hashed = Insights.sourceGrams(Tables.t(spark, sf, "documents"))
      .select(col("source"), col("g"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    def u(g: String): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).take(4)
        .foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      (h.toDouble + 0.5) / 4294967296.0
    }
    val bySrc = hashed.groupBy(_._1).map { case (s, gs) =>
      s -> gs.map(g => u(g._2)).distinct.sorted
    }
    val srcs = bySrc.keys.toSeq.sorted
    val (a, b) = (srcs.head, srcs(1))
    val skA = bySrc(a).take(Insights.PairK)
    val skB = bySrc(b).take(Insights.PairK)
    val mergedSketches = (skA ++ skB).distinct.sorted.take(Insights.PairK)
    val fullUnion = (bySrc(a) ++ bySrc(b)).distinct.sorted.take(Insights.PairK)
    assert(mergedSketches.toSeq == fullUnion.toSeq,
      "k-min over merged k-sketches must equal k-min over the full union")
  }

  test("c121: estimator sanity — j_kmv in [0,1], union estimate positive") {
    val rows = Insights.kmvPairOverlap(spark, sf).collect()
    assert(rows.length == 190)
    rows.foreach { r =>
      val jk = r.getAs[Double]("j_kmv")
      assert(jk >= 0.0 && jk <= 1.0)
      assert(r.getAs[Double]("d_union_est") > 0.0)
    }
  }

  test("c122: 2x2 margins are consistent and chi2 is non-negative") {
    val rows = Insights.chi2Proportions(spark, sf).collect()
    assert(rows.length == 5)
    val users = events.map(_._1).distinct.size
    rows.foreach { r =>
      assert(r.getAs[Long]("conv_a") <= r.getAs[Long]("n_a"))
      assert(r.getAs[Long]("conv_b") <= r.getAs[Long]("n_b"))
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") <= users)
      assert(Option(r.getAs[Double]("chi2")).forall(_ >= 0.0))
    }
  }

  test("c123: U statistic matches a brute-force rank computation") {
    val rows = Insights.mannWhitneyU(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def armA(u: Long): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"arm:$u".getBytes("UTF-8"))
      "%02x".format(h(0)).charAt(0) < '8'
    }
    events.groupBy(_._3).foreach { case (t, es) =>
      val metric = es.groupBy(_._1).map { case (u, xs) =>
        // mirror Canon.dsum: exact decimal sum emitted as double
        val m = xs.map(x => BigDecimal(x._4).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        (u, m, armA(u))
      }.toSeq
      val sorted = metric.sortBy(_._2)
      val ranks = sorted.zipWithIndex.groupBy(_._1._2).flatMap {
        case (_, grp) =>
          val avg = grp.map(_._2 + 1).sum.toDouble / grp.size
          grp.map { case ((u, _, a), _) => (u, avg, a) }
      }
      val n1 = metric.count(_._3)
      val r1 = ranks.filter(_._3).map(_._2).sum
      val u1 = r1 - n1.toLong * (n1 + 1) / 2.0
      val (gn1, gn2, gu) = rows(t)
      assert(gn1 == n1 && gn2 == metric.size - n1)
      assert(math.abs(gu - u1) < 0.51, s"$t: u $gu vs brute $u1")
    }
  }

  test("c124: digit counts partition the orders table; Benford mass sums to 1") {
    val rows = Insights.benfordAudit(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    val nOrders = Tables.t(spark, sf, "orders").count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum == nOrders)
    val mass = rows.map(_.getAs[Double]("p_benford")).sum
    assert(math.abs(mass - 1.0) < 0.001, s"benford mass $mass")
  }

  test("c125: pair counts bounded by marginals; lift consistent with support") {
    val rows = Insights.basketLift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nab, na, nb) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(nab >= Insights.BasketMinPairN && nab <= math.min(na, nb))
      assert(r.getAs[Double]("conf_a_to_b") <= 1.0)
    }
  }

  test("c126: depths match a brute-force per-user funnel scan") {
    val w = Insights.FunnelWUs
    val got = Insights.windowFunnel(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val byUser = events.groupBy(_._1)
    byUser.foreach { case (u, es) =>
      val v = es.filter(_._3 == "view").map(_._5).sorted
      if (v.isEmpty) assert(!got.contains(u))
      else {
        val c = es.filter(_._3 == "click").map(_._5).sorted
        val p = es.filter(_._3 == "purchase").map(_._5).sorted
        val depth = v.map { vt =>
          c.find(ct => ct > vt && ct <= vt + w) match {
            case None => 1
            case Some(ct) =>
              if (p.exists(pt => pt > ct && pt <= vt + w)) 3 else 2
          }
        }.max
        assert(got(u) == ((v.size.toLong, depth)),
          s"user $u: ${got(u)} vs brute ($depth)")
      }
    }
  }

  test("c127: allocation sums exactly to the budget, one extra unit max") {
    val rows = Insights.largestRemainderAlloc(spark, sf).collect()
    assert(rows.length == 25)
    val total = rows.map(_.getAs[Long]("alloc")).sum
    assert(total == Insights.AllocUnits, s"allocated $total")
    rows.foreach { r =>
      val d = r.getAs[Long]("alloc") - r.getAs[Long]("base")
      assert(d == 0L || d == 1L)
    }
  }

  test("b79: moving median matches a brute-force trailing-frame sort") {
    val got = Insights.movingMedian(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val orders = Tables.t(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        unix_micros(col("o_orderdate").cast("timestamp")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    orders.groupBy(_._1).foreach { case (ck, os) =>
      val ordered = os.sortBy(o => (o._4, o._2))
      ordered.zipWithIndex.foreach { case ((_, ok, _, _), i) =>
        val frame = ordered.slice(math.max(0, i - Insights.MedianFrame + 1),
          i + 1).map(_._3).sorted
        val n = frame.length
        val med = if (n % 2 == 1) frame(n / 2)
          else (frame(n / 2 - 1) + frame(n / 2)) / 2.0
        assert(got((ck, ok)) == med, s"cust $ck order $ok")
      }
    }
  }

  test("b80: the mode really is each segment's max count with the asc tiebreak") {
    val got = Insights.modePriority(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val counts = Tables.t(spark, sf, "orders")
      .join(Tables.t(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    counts.groupBy(_._1).foreach { case (seg, cs) =>
      val best = cs.minBy(c => (-c._3, c._2))
      assert(got(seg) == ((best._2, best._3)), s"segment $seg")
    }
  }

  test("c130: the dyadic kernel sums to exactly 1 and matches a scalar fold") {
    val wsum = (0 until Insights.EwmaTaps).map(Insights.ewmaWeight).sum
    assert(wsum == 1.0, s"kernel mass $wsum")
    val got = Insights.ewmaDyadic(spark, sf).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    events.groupBy(_._1).foreach { case (_, es) =>
      val ordered = es.sortBy(e => (e._5, e._2))
      ordered.zipWithIndex.drop(Insights.EwmaTaps - 1).foreach {
        case ((_, eid, _, _, _), i) =>
          // identical fold order: k ascending, left-associated adds
          val expected = (0 until Insights.EwmaTaps)
            .map(k => ordered(i - k)._4 * Insights.ewmaWeight(k))
            .reduce(_ + _)
          assert(got(eid) == expected, s"event $eid")
      }
    }
  }

  test("c131: path counts equal the per-user consecutive-trigram scan") {
    val got = Insights.sessionPaths(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val types = es.sortBy(e => (e._5, e._2)).map(_._3)
      types.sliding(3).filter(_.size == 3).map(_.mkString(">"))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    assert(got == exp)
  }

  test("c132: bounds bracket the exact count and certification is sound") {
    val rows = Insights.shardedTopkBounds(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (lb, ub, n) = (r.getAs[Long]("lb"), r.getAs[Long]("ub"),
        r.getAs[Long]("n_exact"))
      assert(lb <= n && n <= ub, s"${r.getString(0)}: $lb <= $n <= $ub")
    }
    // A certified candidate's exact count must beat every token whose
    // count the protocol could not see (the absent-everywhere bound).
    val exact = Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val emitted = rows.map(_.getString(0)).toSet
    val maxUnseen = (exact -- emitted).values.maxOption.getOrElse(0L)
    rows.filter(_.getAs[Int]("certified") == 1).foreach { r =>
      assert(r.getAs[Long]("n_exact") >= maxUnseen ||
        r.getAs[Long]("lb") >= r.getAs[Long]("ub"),
        s"certified ${r.getString(0)} beaten by an unseen token")
    }
  }

  test("c133: all six expectations pass on the intact fixture") {
    val rows = Insights.expectationAudit(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach(r => assert(r.getAs[Int]("pass") == 1,
      s"${r.getString(0)} failed: metric ${r.getDouble(1)}"))
  }

  test("c134: credit + unattributed conversions account for every purchase") {
    val rows = Insights.linearAttribution(spark, sf).collect()
    val totalCredit = rows.filter(_.getString(0) != "(none)")
      .map(_.getAs[Double]("credit_total")).sum
    val unattributed = rows.find(_.getString(0) == "(none)")
      .map(_.getAs[Long]("n_convs")).getOrElse(0L)
    val purchases = events.count(_._3 == "purchase")
    assert(math.abs(totalCredit + unattributed - purchases) < 0.01,
      s"credit $totalCredit + none $unattributed != $purchases")
  }

  test("c135: anomaly counts match a brute-force per-hour recomputation") {
    val rows = Insights.seasonalBaseline(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    val buckets = events.groupBy(e =>
      (e._5 / 86400000000L, (e._5 / 3600000000L) % 24))
      .map { case ((d, h), es) =>
        val s = es.map(e => BigDecimal(e._4).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)).sum
        (d, h, s.toDouble)
      }.toSeq
    buckets.groupBy(_._2).foreach { case (h, bs) =>
      val n = bs.size
      val s1 = bs.map(_._3).sum
      val mean = s1 / n
      val sd = math.sqrt(bs.map(b => b._3 * b._3).sum / 1.0 match {
        case sq => (sq - s1 * s1 / n) / (n - 1)
      })
      val anom = bs.count(b => math.abs(b._3 - mean) > 2.0 * sd)
      val (gn, ganom) = rows(h)
      assert(gn == n && ganom == anom.toLong,
        s"hod $h: got ($gn,$ganom) want ($n,$anom)")
    }
  }

  test("b81: cumulative share is monotone and the class cuts are honored") {
    val rows = Insights.abcClassification(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getString(3)))
    assert(rows.length == 25)
    rows.sliding(2).foreach {
      case Array((_, r1, c1, _), (_, r2, c2, _)) =>
        assert(r1 >= r2 && c1 <= c2)
      case _ =>
    }
    assert(math.abs(rows.last._3 - 1.0) < 1e-9)
    // class boundaries: every A precedes every B precedes every C
    val classes = rows.map(_._4).mkString
    assert("^A*B*C*$".r.findFirstIn(classes).isDefined, classes)
  }

  test("b82: sliding distinct matches a brute-force trailing scan") {
    val got = Insights.windowDistinct(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val orders = Tables.t(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
        unix_micros(col("o_orderdate").cast("timestamp")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    orders.groupBy(_._1).foreach { case (ck, os) =>
      val ordered = os.sortBy(o => (o._4, o._2))
      ordered.zipWithIndex.foreach { case ((_, ok, _, _), i) =>
        val frame = ordered.slice(math.max(0, i - Insights.DistinctFrame + 1),
          i + 1).map(_._3).distinct.size
        assert(got((ck, ok)) == frame, s"cust $ck order $ok")
      }
    }
  }

  test("c137: percentiles are real latencies inside the funnel window") {
    val rows = Insights.funnelLatency(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val (p50, p90) = (r.getAs[Long]("p50_us"), r.getAs[Long]("p90_us"))
    assert(p50 > 0 && p50 <= p90 && p90 <= Insights.FunnelWUs)
    assert(r.getAs[Long]("n_conversions") > 0)
  }

  test("c138: mass is conserved up to the floor leak and the chain has converged") {
    val pi = Insights.markovStationary(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pi.size == 5 && pi.values.forall(_ >= 0.0))
    val mass = pi.values.sum
    assert(mass <= 1.0 && mass > 0.999, s"mass $mass")
    // convergence: recompute transitions and apply ONE more exact round
    val trans = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._5, e._2)).map(_._3).sliding(2)
        .filter(_.size == 2).map(p => (p(0), p(1)))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val rowTot = trans.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    val next = pi.keys.map { j =>
      j -> pi.keys.map { i =>
        pi(i) * trans.getOrElse((i, j), 0L).toDouble / rowTot(i)
      }.sum
    }.toMap
    pi.keys.foreach { s =>
      assert(math.abs(pi(s) - next(s)) < 0.002, s"$s: ${pi(s)} vs ${next(s)}")
    }
  }

  test("b83: the forward as-of really is the earliest at-or-after purchase") {
    val got = Insights.asofForward(spark, sf).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_ => r.getLong(4))).toMap
    val byUser = events.groupBy(_._1)
    events.filter(_._3 == "click").foreach { case (u, cid, _, _, cts) =>
      val expected = byUser(u).filter(e => e._3 == "purchase" && e._5 >= cts)
        .sortBy(e => (e._5, e._2)).headOption.map(_._5)
      assert(got(cid) == expected, s"click $cid")
    }
  }

  test("c139: bars bracket their contents — low <= open/close <= high") {
    val rows = Insights.tumblingOhlc(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))
      assert(l <= o && o <= h && l <= c && c <= h, s"hour ${r.getLong(0)}")
    }
    assert(rows.map(_.getAs[Long]("n_events")).sum == events.size)
  }

  test("c140: the halves partition every event") {
    val rows = Insights.periodMovers(spark, sf).collect()
    assert(rows.map(r => r.getAs[Long]("n1") + r.getAs[Long]("n2")).sum ==
      events.size)
  }

  test("c141: the day-grain split is consistent and day one is all-new") {
    val rows = Insights.newVsReturning(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (_, act, nw, ret) => assert(act == nw + ret) }
    val first = rows.minBy(_._1)
    assert(first._2 == first._3, "every user on the earliest day is new")
    assert(rows.map(_._3).sum == events.map(_._1).distinct.size,
      "each user is new exactly once")
  }

  test("c142: the sample-size formula round-trips against a scalar check") {
    val rows = Insights.powerAnalysis(spark, sf).collect()
    rows.foreach { r =>
      val (p1, p2) = (r.getDouble(3), r.getDouble(4))
      Option(r.get(5)).foreach { nr =>
        // recompute from the ROUNDED rates — must land within the
        // rounding slack of the emitted requirement
        val d = p1 - p2
        val pbar = (p1 + p2) / 2.0
        val num = 1.959963984540054 * math.sqrt(2 * pbar * (1 - pbar)) +
          0.8416212335729143 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
        val approx = num * num / (d * d)
        val got = nr.asInstanceOf[Long].toDouble
        assert(math.abs(got - approx) / approx < 0.15,
          s"${r.getString(0)}: $got vs ~$approx")
      }
    }
  }

  test("c144: LTV curves accumulate monotonically and cover every user once") {
    val rows = Insights.cohortLtv(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (cohort, cs) =>
      val ordered = cs.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Array((_, _, _, _, c1), (_, _, _, _, c2)) =>
          assert(c2 >= c1, s"cohort $cohort LTV decreased")
        case _ =>
      }
      assert(math.abs(ordered.map(_._4).sum - ordered.last._5) < 1e-3)
    }
    val perCohortUsers = rows.groupBy(_._1).map(_._2.head._3).sum
    assert(perCohortUsers == events.map(_._1).distinct.size)
  }

  test("c145: buckets partition the positive gaps and bounds are true powers of two") {
    val rows = Insights.gapHistogram(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (b, from, to, _) =>
      assert(from == (1L << b) && to == (1L << (b + 1)) - 1)
    }
    val nGaps = events.groupBy(_._1).map { case (_, es) =>
      es.sortBy(e => (e._5, e._2)).map(_._5).sliding(2)
        .count(p => p.size == 2 && (p(1) - p(0)) / 1000000L >= 1L)
    }.sum
    assert(rows.map(_._4).sum == nGaps)
  }

  test("c146: theta matches a brute-force covariance ratio and rho2 is in [0,1]") {
    val r = Insights.cupedAdjustment(spark, sf).collect().head
    val mid = {
      val days = events.map(_._5 / 86400000000L)
      days.min + (days.max - days.min + 1) / 2
    }
    val perUser = events.groupBy(_._1).map { case (u, es) =>
      def s(p: ((Long, Long, String, Double, Long)) => Boolean) =
        es.filter(p).map(e => BigDecimal(e._4).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)).sum
      (u, s(_._5 / 86400000000L < mid), s(_._5 / 86400000000L >= mid))
    }.toSeq
    val n = perUser.size
    val sx = perUser.map(_._2).sum.toDouble
    val sy = perUser.map(_._3).sum.toDouble
    val sxy = perUser.map(p => p._2 * p._3).sum.toDouble
    val sxx = perUser.map(p => p._2 * p._2).sum.toDouble
    val theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-3,
      s"${r.getAs[Double]("theta")} vs $theta")
    val rho2 = r.getAs[Double]("var_reduction")
    assert(rho2 >= 0.0 && rho2 <= 1.0)
  }

  test("c147: the DiD estimate is the literal double difference of cell means") {
    val r = Insights.didEstimator(spark, sf).collect().head
    val did = (r.getAs[Double]("mean_b_post") - r.getAs[Double]("mean_b_pre")) -
      (r.getAs[Double]("mean_a_post") - r.getAs[Double]("mean_a_pre"))
    assert(math.abs(r.getAs[Double]("did_estimate") - did) < 2e-3)
  }

  test("c148: the winsorized mean sits inside the cuts and clamps ~2p of the mass") {
    val rows = Insights.winsorizedMean(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, lo, hi) = (r.getAs[Long]("n"), r.getAs[Double]("p_lo"),
        r.getAs[Double]("p_hi"))
      val wm = r.getAs[Double]("winsorized_mean")
      assert(lo <= wm && wm <= hi)
      val clamped = r.getAs[Long]("n_clamped_low") +
        r.getAs[Long]("n_clamped_high")
      assert(clamped <= (2 * Insights.WinsorP * n).toLong + 2,
        s"clamped $clamped of $n")
    }
  }

  test("b84/b85: multiset semantics — counts are differences/minima of occurrence counts") {
    import org.apache.spark.sql.functions.unix_micros
    val orders = Tables.t(spark, sf, "orders")
      .select(col("o_orderpriority"), col("o_orderstatus"),
        col("o_totalprice"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    def counts(p: ((String, String, Double, Long)) => Boolean) =
      orders.filter(p).groupBy(o => (o._1, o._2))
        .map { case (k, v) => k -> v.size.toLong }
    val hi = counts(_._3 > 200000.0)
    val vhi = counts(_._3 > 350000.0)
    val gotE = Insights.exceptAll(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    hi.foreach { case (k, n) =>
      val exp = n - vhi.getOrElse(k, 0L)
      if (exp > 0) assert(gotE(k) == exp, s"$k: ${gotE.get(k)} vs $exp")
      else assert(!gotE.contains(k))
    }
    val early = counts(_._4 < Insights.OrderDateMaxUs - 2L * 365L * 86400000000L)
    val gotI = Insights.intersectAll(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    hi.keys.toSet.union(early.keys.toSet).foreach { k =>
      val exp = math.min(hi.getOrElse(k, 0L), early.getOrElse(k, 0L))
      if (exp > 0) assert(gotI(k) == exp) else assert(!gotI.contains(k))
    }
  }

  test("c151: the Lorenz curve is convex-ish, ends at 1, and covers every user") {
    val rows = Insights.lorenzCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (0L to 9L))
    assert(rows.map(_._2).sum == events.map(_._1).distinct.size)
    assert(math.abs(rows.last._4 - 1.0) < 1e-9)
    // the Lorenz property: with users ranked ascending, cumulative
    // value share never exceeds cumulative user share
    val total = rows.map(_._2).sum.toDouble
    var cumUsers = 0L
    rows.foreach { case (d, nu, _, cumShare) =>
      cumUsers += nu
      assert(cumShare <= cumUsers / total + 1e-4,
        s"decile $d: value share $cumShare > user share ${cumUsers / total}")
    }
  }

  test("c152: DAU <= MAU, stickiness in (0,1], MAU matches a brute-force trailing union") {
    val rows = Insights.dauMau(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val userDays = events.map(e => (e._1, e._5 / 86400000000L)).distinct
    rows.foreach { case (d, dau, mau, st) =>
      assert(dau <= mau && st > 0.0 && st <= 1.0)
      val expMau = userDays
        .filter(ud => ud._2 > d - Insights.MauDays && ud._2 <= d)
        .map(_._1).distinct.size
      assert(mau == expMau, s"day $d: $mau vs $expMau")
    }
  }

  test("c128: frontier is strictly monotone and dominates every dropped point") {
    val frontier = Insights.paretoFrontier(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    frontier.sliding(2).foreach {
      case Array((p1, s1), (p2, s2)) => assert(p1 < p2 && s1 < s2)
      case _ =>
    }
    val pts = Tables.t(spark, sf, "part")
      .select(col("p_retailprice"), col("p_size")).collect()
      .map(r => (r.getDouble(0), r.getInt(1))).distinct
    val fset = frontier.toSet
    pts.filterNot(fset).foreach { case (pr, sz) =>
      assert(pts.exists { case (p2, s2) =>
        p2 <= pr && s2 >= sz && (p2 < pr || s2 > sz)
      }, s"dropped ($pr,$sz) is not dominated")
    }
  }

  test("c183: bins partition every order; WOE/IV recomputed independently for every bin") {
    val out = Insights.woeBinning(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val orders = Tables.t(spark, sf, "orders")
      .select(col("o_totalprice"), col("o_orderpriority")).collect()
      .map(r => (math.round(r.getDouble(0) * 100), r.getString(1) == "1-URGENT"))
    assert(out.map(_._2).sum == orders.length, "bins must partition every order")
    assert(out.forall(b => b._1 >= 0 && b._1 < Insights.WoeBins))
    // Independent replay: integer-cents equal-width bins, smoothed
    // log-odds, IV contribution — per bin, bit for bit.
    val lo = orders.map(_._1).min; val hi = orders.map(_._1).max
    val width = (hi - lo) / Insights.WoeBins + 1
    val byBin = orders.groupBy { case (c, _) => (c - lo) / width }
    val posTot = orders.count(_._2).toLong
    val negTot = orders.length - posTot
    out.foreach { case (bin, n, nPos, nNeg, woe, iv) =>
      val rows = byBin(bin)
      assert(n == rows.length && nPos == rows.count(_._2) && nNeg == rows.count(!_._2))
      val w = math.log(((nPos.toDouble + 0.5) / posTot) / ((nNeg.toDouble + 0.5) / negTot))
      def r4(d: Double) = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(woe == r4(w), s"bin $bin woe drifted: $woe vs ${r4(w)}")
      assert(iv == r4((nPos.toDouble / posTot - nNeg.toDouble / negTot) * w))
    }
    // The event concentrates somewhere: at least one bin carries a
    // non-zero IV contribution, or the audit is vacuous.
    assert(out.exists(_._6 != 0.0), "every bin has zero IV — test vacuous")
  }

  test("c184: the temporal split is leakage-free — train ends a full embargo before test begins, and all three buckets are populated") {
    for (sfd <- Seq(TestSpark.sf0001, TestSpark.sf001)) {
      val out = Insights.temporalSplitEmbargo(spark, sfd).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      assert(out.keySet == Set("train", "embargo_dropped", "test"),
        s"missing bucket at $sfd: ${out.keySet}")
      val ev = Tables.t(spark, sfd, "events")
      val all = ev.select(Tables.tsUs(ev).as("t")).collect().map(_.getLong(0))
      assert(out.values.map(_._1).sum == all.length, "buckets must partition the events")
      val lo = all.min; val hi = all.max
      val cut = lo + (hi - lo) * 4 / 5
      val emb = (hi - lo) / Insights.EmbargoDen
      // The structural guarantee: no train row inside the embargo, no
      // test row before the cut — so every (train, test) pair is at
      // least `emb` apart.
      assert(out("train")._4 < cut - emb, "a train row leaked into the embargo band")
      assert(out("test")._3 >= cut, "a test row precedes the cut")
      assert(out("test")._3 - out("train")._4 > emb,
        "train/test gap narrower than the embargo")
      assert(out("embargo_dropped")._3 >= cut - emb && out("embargo_dropped")._4 < cut)
    }
  }
}
