package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

/** Salting is an algebraic rewrite: salted results must equal the
  * unsalted plan's results exactly, on pathologically skewed data
  * (one key = 90% of rows).
  */
class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 9000 rows of key 0, ~1000 spread over keys 1..10
  private lazy val skewed = (
    (1 to 9000).map(i => (0L, i.toLong)) ++
    (1 to 1000).map(i => ((i % 10 + 1).toLong, i.toLong))
  ).toDF("k", "v").repartition(8)

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy($"k")
      .agg(sum($"v").as("sum_value"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val salted = Skew.saltedSumCount(skewed, $"k", $"v", 16, $"v")
      .select($"_k", $"sum_value", $"n")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(plain.sameElements(salted))
  }

  test("salted join equals plain join") {
    val dim = (0L to 10L).map(k => (k, s"name$k")).toDF("dk", "name")
    val plain = skewed.join(dim, $"k" === $"dk")
      .groupBy($"name").count()
      .as[(String, Long)].collect().sortBy(_._1)
    val salted = Skew.saltedJoin(skewed, dim, $"k", $"dk", 16, $"v")
      .groupBy($"name").count()
      .as[(String, Long)].collect().sortBy(_._1)
    assert(plain.sameElements(salted))
  }

  test("c200: a hot-key corpus makes the audit recommend salt > 1 and the adaptive join still equals plain") {
    // Constructed skew: order 0 carries 600 lineitem rows, orders
    // 1..100 carry 2 each → nk=600, n_keys=101, n_rows=800,
    // skew_x = 600*101/800 ≈ 75.8 → salt_rec clamps to 32. The
    // adaptive kernel must take the SALTED branch and produce
    // byte-identical aggregates to the plain join.
    val l = (
      (1 to 600).map(i => (0L, 10.0 + i % 7, 0.05, i.toLong)) ++
      (1 to 100).flatMap(k => Seq(
        (k.toLong, 20.0 + k % 5, 0.02, 1L), (k.toLong, 30.0 + k % 3, 0.04, 2L)))
    ).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_linenumber")
      .repartition(8)
    val o = (0 to 100).map(k => (k.toLong, if (k % 3 == 0) "F" else "O"))
      .toDF("o_orderkey", "o_orderstatus")
    val (width, adaptive) = ops.Relational.adaptiveJoinKernel(o, l)
    assert(width > 1L, s"audit failed to recommend salting on the hot-key corpus: $width")
    assert(width == 32L, s"clamped recommendation drifted: $width")
    val got = adaptive.as[(String, Long, Double)].collect().sortBy(_._1)
    val want = o.join(l, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        graft.Canon.dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(got.sameElements(want),
      s"adaptive join diverged from plain: ${got.toSeq} vs ${want.toSeq}")
    // and a uniform corpus must pick the plain branch
    val lu = (1 to 100).map(k => (k.toLong, 10.0, 0.0, 1L))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_linenumber")
    val (w2, _) = ops.Relational.adaptiveJoinKernel(o, lu)
    assert(w2 == 1L, s"uniform corpus must not salt: $w2")
  }

  test("salt actually spreads the hot key") {
    val spread = skewed.where($"k" === 0)
      .withColumn("_salt", pmod(hash($"v"), lit(16)))
      .select($"_salt").distinct().count()
    assert(spread > 8, s"hot key only landed in $spread salt buckets")
  }

  test("salting narrows the max task-input share on a skewed corpus") {
    // The algebra tests above prove correctness; this one proves the
    // BENEFIT: on a 200k-row corpus where one key holds 90% of rows,
    // measure the largest hash-shuffle bucket (= the biggest join
    // task's input) keyed by k alone vs by (k, salt). Unsalted, the
    // hot key pins ~90% of the corpus on one task — the straggler that
    // kills a 1000-executor job; salted over 16 sub-keys the max task
    // share must drop by at least 4× (expected ~16×).
    val n = 200000L
    val big = spark.range(n).select(
      when(pmod($"id", lit(100)) < 90, 0L)
        .otherwise(pmod($"id", lit(1000))).as("k"),
      $"id".as("v"))
    def maxShare(df: org.apache.spark.sql.DataFrame,
        keys: org.apache.spark.sql.Column*): Double = {
      val biggest = df.repartition(32, keys: _*)
        .select(spark_partition_id().as("p"))
        .groupBy($"p").count()
        .agg(max($"count")).as[Long].head()
      biggest.toDouble / n
    }
    val unsalted = maxShare(big, $"k")
    val salted = maxShare(
      big.withColumn("_salt", pmod(hash($"v"), lit(16))), $"k", $"_salt")
    assert(unsalted > 0.5, s"fixture not skewed enough: $unsalted")
    assert(salted < unsalted / 4,
      s"salting did not narrow the spread: unsalted=$unsalted salted=$salted")
  }

  // Hints live as ResolvedHint in the ANALYZED plan; the optimizer
  // folds them into Join nodes, so the analyzed tree is the place a
  // forced hint is unambiguously visible.
  private def hasBroadcastHint(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
          if h.hints.strategy.contains(
            org.apache.spark.sql.catalyst.plans.logical.BROADCAST) => h
    }.nonEmpty

  test("maybeBroadcast hints under the bound, defers to AQE over it") {
    // Duplicate-scaled sets (loser lists, shared grams) must never
    // carry an UNCONDITIONAL broadcast hint: at web scale the c49
    // shared-gram set is terabyte-class and a forced broadcast
    // breaches the 8 GiB limit where AQE would have shuffle-joined.
    val dim = (0L to 10L).map(k => (k, s"name$k")).toDF("dk", "name")
    assert(hasBroadcastHint(
      skewed.join(Skew.maybeBroadcast(dim, boundRows = 11L, rowBytes = 32L, spark),
        $"k" === $"dk")),
      "provably-small side was not hinted")
    assert(!hasBroadcastHint(
      skewed.join(
        Skew.maybeBroadcast(dim, boundRows = Long.MaxValue / 16, rowBytes = 32L,
          spark),
        $"k" === $"dk")),
      "over-bound side still carries a forced broadcast hint")
  }

  test("maybeBroadcast cap is session-tunable and 0 disables every hint") {
    val s2 = spark.newSession()
    s2.conf.set(Skew.BroadcastCapConf, "0")
    import s2.implicits._
    val dim2 = (0L to 10L).map(k => (k, s"name$k")).toDF("dk", "name")
    assert(!hasBroadcastHint(
      dim2.join(Skew.maybeBroadcast(dim2.select($"dk".as("d2")),
        boundRows = 1L, rowBytes = 1L, s2), $"dk" === $"d2")),
      "cap=0 session still produced a broadcast hint")
  }

  test("maybeBroadcast cap accepts byte-string sizes and rejects junk loudly") {
    // "256m"/"1g" is the idiom of the autoBroadcastJoinThreshold conf
    // this cap is documented as analogous to — parsed with Spark's own
    // byte-string parser, not a bare toLong (round-9 ADVICE: "256m"
    // threw a lazy NumberFormatException at plan time of every hinted
    // query).
    val s2 = spark.newSession()
    import s2.implicits._
    val dim = (0L to 10L).map(k => (k, s"n$k")).toDF("dk", "name")
    s2.conf.set(Skew.BroadcastCapConf, "256m")
    assert(hasBroadcastHint(
      dim.join(Skew.maybeBroadcast(dim.select($"dk".as("d2")),
        boundRows = 11L, rowBytes = 32L, s2), $"dk" === $"d2")),
      "a '256m' cap should hint an 11-row side")
    s2.conf.set(Skew.BroadcastCapConf, "lots")
    val e = intercept[IllegalArgumentException] {
      Skew.maybeBroadcast(dim, boundRows = 1L, rowBytes = 1L, s2)
    }
    assert(e.getMessage.contains(Skew.BroadcastCapConf))
  }

  test("c49 without the broadcast hint returns the identical result") {
    // The rehearsal posture: drive the AQE path (cap=0 simulates a
    // boilerplate-heavy corpus whose shared-gram set cannot
    // broadcast) and require bit-identical output to the hinted plan.
    val s2 = spark.newSession()
    s2.conf.set(Skew.BroadcastCapConf, "0")
    val sfd = TestSpark.sf0001
    val hinted = graft.ops.NearDup.dupFraction(spark, sfd)
    val aqe = graft.ops.NearDup.dupFraction(s2, sfd)
    assert(hasBroadcastHint(hinted), "fixture-scale plan lost its hint")
    assert(!hasBroadcastHint(aqe), "cap=0 plan still hinted")
    assert(hinted.collect().toSeq == aqe.collect().toSeq,
      "hinted and AQE plans diverged")
  }
}
