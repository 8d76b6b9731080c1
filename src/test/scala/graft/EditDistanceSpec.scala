package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.EditKernel

/** Exactness pins for the bit-parallel Levenshtein kernel (c117's
  * round-13 engine). Three independent referees:
  *
  *  1. a classic cell-matrix DP implemented HERE (not Spark's) over
  *     code points — an implementation the kernel shares no code
  *     with;
  *  2. Spark's builtin `levenshtein` through a real query (the
  *     value-identity the c117 rewrite claims);
  *  3. hand-pinned corners (empties, unicode incl. supplementary
  *     plane, the 64/128-bit block boundaries the blocked algorithm
  *     is most likely to get wrong).
  */
class EditDistanceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** Independent referee: two-row DP over code points. */
  private def refDp(a: String, b: String): Int = {
    val pa = a.codePoints().toArray
    val pb = b.codePoints().toArray
    var prev = Array.tabulate(pb.length + 1)(identity)
    var cur = new Array[Int](pb.length + 1)
    for (i <- 1 to pa.length) {
      cur(0) = i
      for (j <- 1 to pb.length) {
        val sub = prev(j - 1) + (if (pa(i - 1) == pb(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      val t = prev; prev = cur; cur = t
    }
    prev(pb.length)
  }

  private def kernel(a: String, b: String): Int =
    EditKernel.distance(UTF8String.fromString(a), UTF8String.fromString(b))

  test("hand-pinned corners: empties, identity, unicode, supplementary plane") {
    assert(kernel("", "") == 0)
    assert(kernel("", "abc") == 3)
    assert(kernel("abc", "") == 3)
    assert(kernel("abc", "abc") == 0)
    assert(kernel("kitten", "sitting") == 3)
    assert(kernel("flaw", "lawn") == 2)
    // é is one code point, 中文 two; the emoji is a SUPPLEMENTARY
    // code point (two UTF-16 chars) and must count as ONE edit.
    assert(kernel("café", "cafe") == 1)
    assert(kernel("中文", "中") == 1)
    assert(kernel("a😀b", "ab") == 1)
    assert(kernel("a😀b", "a😁b") == 1)
  }

  test("block boundaries: every pattern length from 60 to 132 agrees with the reference DP") {
    // The blocked algorithm's riskiest lengths: around 64 (1→2 words)
    // and 128 (2→3 words), with the partial last block holding 1..64
    // live bits. Deterministic pseudo-random strings, small alphabet
    // so distances exercise match-heavy structure.
    val rnd = new scala.util.Random(7)
    for (m <- 60 to 132; if m % 2 == 0) {
      val a = (1 to m).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val b = (1 to m + rnd.nextInt(9) - 4).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      assert(kernel(a, b) == refDp(a, b), s"m=$m a=$a b=$b")
      assert(kernel(b, a) == refDp(a, b), s"symmetric m=$m")
    }
  }

  test("property: 400 random string pairs (lengths 0..200, mixed alphabets) match the reference DP") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val charGen = Gen.frequency(
      6 -> Gen.alphaChar,
      2 -> Gen.oneOf('a', 'b'), // forces high-match structure
      1 -> Gen.oneOf('é', '中', 'ß', 'б'),
      1 -> Gen.const('\uD83D')) // paired below into a valid surrogate
    def mk(seed: Long, maxLen: Int): String = {
      val lenGen = Gen.choose(0, maxLen)
      val len = lenGen(Gen.Parameters.default, Seed(seed)).get
      val raw = Gen.listOfN(len, charGen)(Gen.Parameters.default, Seed(seed * 31 + 1))
        .get.mkString
      // repair lone high surrogates into a valid emoji so the string
      // is well-formed UTF-8 (UTF8String round-trips it)
      raw.replace("\uD83D", "😀")
    }
    (1 to 200).foreach { s =>
      val a = mk(s.toLong, 200)
      val b = mk(s.toLong + 10000, 200)
      assert(kernel(a, b) == refDp(a, b),
        s"seed=$s len_a=${a.length} len_b=${b.length}")
      assert(kernel(a, a) == 0)
    }
  }

  test("c158: every planted typo pair is recovered at d=1 (the construction-level recall proof)") {
    import org.apache.spark.sql.functions._
    val out = graft.ops.Llm.editJoinExact(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val planted = Tables.t(spark, TestSpark.sf0001, "documents")
      .where(substring(md5(concat(lit("typo:"), col("doc_id").cast("string"))), 1, 1) < "8")
      .select("doc_id").collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    planted.foreach { id =>
      assert(out.contains((id, id, 1L)),
        s"planted typo on doc $id not recovered — PassJoin blocking lost a pair")
    }
    // and the blocking is genuinely sub-quadratic on this corpus:
    // result ∝ near-identical density, nowhere near n²/2
    val n = Tables.t(spark, TestSpark.sf0001, "documents").count()
    assert(out.size < n * 4, s"${out.size} pairs looks quadratic for $n docs")
  }

  test("c159: every planted dirty record links back to its source, at the class's exact score") {
    import org.apache.spark.sql.functions._
    val out = graft.ops.Llm.recordLinkage(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(r.fieldIndex("cust_id")),
        r.getLong(r.fieldIndex("dirty_id")), r.getInt(r.fieldIndex("score"))))
    val links = out.map(t => (t._1, t._2) -> t._3).toMap
    val dealt = Tables.t(spark, TestSpark.sf0001, "customer")
      .select(col("c_custkey"),
        when(substring(md5(concat(lit("link:"), col("c_custkey").cast("string"))), 2, 1) < "8", 0)
          .otherwise(1).as("cls"))
      .where(substring(md5(concat(lit("link:"), col("c_custkey").cast("string"))), 1, 1) < "8")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(dealt.nonEmpty && dealt.exists(_._2 == 0) && dealt.exists(_._2 == 1),
      "fixture must exercise both corruption classes")
    dealt.foreach { case (id, cls) =>
      // class 0 (name-corrupted): caught by the balance pass, scores
      // block 2 + name 4 (dist 1 <= 1) + bal 3 = 9; class 1
      // (balance-corrupted): caught by the exact-name pass, scores
      // 2 + 4 + 0 = 6 — exactly the link threshold.
      val expected = if (cls == 0) 9 else 6
      assert(links.get((id, id)).contains(expected),
        s"planted record $id (class $cls) should self-link at $expected, " +
          s"got ${links.get((id, id))}")
    }
    // Blocking keeps the candidate set linear: links are the planted
    // pairs plus rare block-collisions, nowhere near n^2.
    val n = Tables.t(spark, TestSpark.sf0001, "customer").count()
    assert(out.length < n * 4, s"${out.length} links looks quadratic for $n customers")
  }

  test("c161: every dirty record gets exactly one decision; planted records resolve to their true clean id") {
    import org.apache.spark.sql.functions._
    val out = graft.ops.Llm.linkageResolution(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(r.fieldIndex("dirty_id")),
        if (r.isNullAt(r.fieldIndex("matched_id"))) None
        else Some(r.getLong(r.fieldIndex("matched_id"))),
        r.getInt(r.fieldIndex("score")),
        r.getString(r.fieldIndex("decision"))))
    // The complete gate: exactly one decision per dirty record —
    // the output's dirty_id set IS the dirty side's id set, no dup.
    val dirtyIds = Tables.t(spark, TestSpark.sf0001, "customer")
      .where(substring(md5(concat(lit("link:"), col("c_custkey").cast("string"))), 1, 1) < "8")
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    assert(out.length == dirtyIds.size,
      s"${out.length} decisions for ${dirtyIds.size} dirty records")
    assert(out.map(_._1).toSet == dirtyIds, "decision set must cover every dirty record")
    // Planted records resolve to their true clean id: the self-pair
    // scores 9 (class 0) or 6 (class 1); a stranger can also reach
    // those scores, so the argmax guarantee tested here is "the true
    // id wins unless a same-score stranger with a HIGHER id exists" —
    // on this fixture no planted record loses its self-link (asserted
    // by checking the winner's score is never above the self score,
    // and that self wins whenever it is the unique best).
    val pairs = graft.ops.Llm.recordLinkage(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(r.fieldIndex("score"))))
    val byDirty = pairs.groupBy(_._2)
    out.foreach { case (did, matched, score, decision) =>
      val cands = byDirty.getOrElse(did, Array.empty)
      assert(cands.nonEmpty, s"dirty $did has a planted self-pair, must have candidates")
      val bestScore = cands.map(_._3).max
      val expected = cands.filter(_._3 == bestScore).map(_._1).max
      assert(decision == "linked" && matched.contains(expected) && score == bestScore,
        s"dirty $did resolved to $matched@$score, argmax says $expected@$bestScore")
    }
    // And the self-link is the winner in the overwhelming majority —
    // the fixture's names differ by digits, so same-score strangers
    // are rare; a resolution that mostly mis-assigns is wrong even if
    // it is argmax-consistent.
    val selfWins = out.count { case (did, m, _, _) => m.contains(did) }
    assert(selfWins * 10 >= out.length * 9,
      s"only $selfWins/${out.length} planted records resolved to themselves")
  }

  test("c161: the resolution plan is a map-side argmax — no window over candidates, no cartesian") {
    val p = graft.ops.Llm.linkageResolution(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.toLowerCase.contains("window"),
      s"the decision step must be the a16 argmax, not a window sort:\n$p")
    assert("partial_max|partial.*max".r.findFirstIn(p.toLowerCase).nonEmpty ||
      p.contains("HashAggregate"),
      s"argmax should partial-aggregate map-side:\n$p")
  }

  test("c163: bands follow the two-threshold rule; planted classes land in their exact band") {
    import org.apache.spark.sql.functions._
    val out = graft.ops.Llm.linkageBands(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(r.fieldIndex("score")), r.getString(r.fieldIndex("band"))))
    assert(out.nonEmpty)
    // Band is a pure function of score — the two-threshold rule.
    out.foreach { case (c, d, s, b) =>
      val expected = if (s >= 9) "link" else if (s >= 6) "review" else "nonlink"
      assert(b == expected, s"pair ($c,$d) score $s banded $b, rule says $expected")
    }
    // Candidate pairs are unique (the two passes are disjoint by the
    // balance predicate even without the threshold).
    assert(out.map(t => (t._1, t._2)).distinct.length == out.length,
      "a candidate pair appeared in both passes")
    // Planted class 0 (name-corrupted, balance stable) self-links at
    // 9 → 'link'; class 1 (balance-corrupted, name stable) at 6 →
    // 'review' — the FS triage sends exactly the single-field
    // agreements to clerical review.
    val bands = out.map(t => (t._1, t._2) -> t._4).toMap
    val dealt = Tables.t(spark, TestSpark.sf0001, "customer")
      .select(col("c_custkey"),
        when(substring(md5(concat(lit("link:"), col("c_custkey").cast("string"))), 2, 1) < "8", 0)
          .otherwise(1).as("cls"))
      .where(substring(md5(concat(lit("link:"), col("c_custkey").cast("string"))), 1, 1) < "8")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    dealt.foreach { case (id, cls) =>
      val expected = if (cls == 0) "link" else "review"
      assert(bands.get((id, id)).contains(expected),
        s"planted record $id (class $cls) banded ${bands.get((id, id))}, expected $expected")
    }
    // And the thresholded c159 output is exactly the link+review bands.
    val kept = graft.ops.Llm.recordLinkage(spark, TestSpark.sf0001).count()
    assert(out.count(_._4 != "nonlink").toLong == kept,
      "link+review bands must equal the thresholded pair set")
  }

  test("c159: the linkage plan is blocking equi-joins — no cartesian, kernel only at scoring") {
    val p = graft.ops.Llm.recordLinkage(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), s"theta-join crept into c159:\n$p")
    assert("edit_distance".r.findAllIn(p).nonEmpty, "kernel missing from scoring")
  }

  test("value identity with Spark's builtin levenshtein through a real query") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 300).map { i =>
      val toks = (1 to rnd.nextInt(60)).map(_ =>
        (1 to 1 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      val a = toks.mkString(" ")
      val b = toks.zipWithIndex.filter(_._2 % (2 + i % 7) != 0).map(_._1).mkString(" ")
      (a, b)
    }
    val df = rows.toDF("a", "b").select(
      levenshtein(col("a"), col("b")).as("builtin"),
      graft.functions.EditDistance.edist(col("a"), col("b")).as("kernel"))
    val diff = df.where(col("builtin") =!= col("kernel")).count()
    assert(diff == 0L, s"$diff rows diverge from the builtin")
    // and nulls propagate like the builtin's
    val n = Seq((null.asInstanceOf[String], "x")).toDF("a", "b")
      .select(graft.functions.EditDistance.edist(col("a"), col("b")).as("d"))
      .head()
    assert(n.isNullAt(0), "null input must yield null")
  }
}
