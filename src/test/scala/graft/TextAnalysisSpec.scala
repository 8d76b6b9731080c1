package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

/** Pinned-value tests for the chunking (c52) and BPE pair-count (c53)
  * kernels on hand-built documents, where the expected window
  * arithmetic and pair multiplicities can be stated exactly.
  */
class TextAnalysisSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  // --- c52 chunking: W=32, S=24, overlap W-S=8 ---

  test("c52: an 80-token doc yields starts 1/25/49 — the redundant tail start 73 is dropped") {
    val text = (1 to 80).map(i => s"t$i").mkString(" ")
    val out = TextAnalysis.chunkTokensFrom(docs(1L -> text))
      .select("chunk_idx", "start_token", "chunk_tokens").as[(Long, Long, Long)].collect()
    // start 73 would cover tokens 73..80, a pure suffix of chunk 49..80
    // (49+31 = 80): bound max(n-(W-S),1) = 72 excludes it.
    assert(out.toSeq == Seq((1L, 1L, 32L), (2L, 25L, 32L), (3L, 49L, 32L)))
  }

  test("c52: every token is covered — the last chunk's tail reaches n exactly") {
    for (n <- Seq(1, 8, 31, 32, 33, 56, 57, 80, 100)) {
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      val out = TextAnalysis.chunkTokensFrom(docs(1L -> text))
        .select("start_token", "chunk_tokens").as[(Long, Long)].collect()
      val tail = out.map { case (s, c) => s + c - 1 }.max
      assert(tail == n.toLong, s"n=$n: last covered token $tail != $n")
      // interior chunks are full-width; starts step by exactly S
      val starts = out.map(_._1).sorted
      assert(starts.head == 1L)
      starts.sliding(2).foreach {
        case Array(a, b) => assert(b - a == 24L, s"n=$n: stride ${b - a}")
        case _ =>
      }
      out.dropRight(1).foreach { case (s, c) =>
        if (out.length > 1) assert(c == 32L, s"n=$n: interior chunk at $s has $c tokens")
      }
    }
  }

  test("c52: a short doc (n < W) is one chunk of all n tokens") {
    val out = TextAnalysis.chunkTokensFrom(docs(7L -> "only five tokens right here"))
      .select("chunk_idx", "start_token", "chunk_tokens").as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 1L, 5L)))
  }

  test("c52: chunk_md5 is content-addressed — identical windows hash identically across docs") {
    val text = (1 to 40).map(i => s"t$i").mkString(" ")
    val out = TextAnalysis.chunkTokensFrom(docs(1L -> text, 2L -> text))
      .select("doc_id", "chunk_idx", "chunk_md5").as[(Long, Long, String)].collect()
    val byDoc = out.groupBy(_._1).map { case (d, rs) =>
      d -> rs.sortBy(_._2).map(_._3).toSeq
    }
    assert(byDoc(1L) == byDoc(2L))
  }

  // --- c58 temperature sampling ---

  test("c58: alpha=0.3 up-weights the rare language and weights sum to 1") {
    val out = ops.TextAnalysis.temperatureMix(TestSpark.spark, TestSpark.sf0001)
      .select("lang", "n_docs", "share", "weight", "boost")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out.nonEmpty)
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-2)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-2)
    // temperature flattening: the rarest language's boost >= the most
    // common language's boost, with equality only on equal counts
    val byCount = out.sortBy(_._2)
    assert(byCount.head._5 >= byCount.last._5)
    // boost crosses 1.0: below-average-share langs boosted, above damped
    out.foreach { case (l, _, share, weight, boost) =>
      assert(math.abs(boost - weight / share) < 2e-3, s"$l boost != weight/share")
    }
  }

  // --- c53 BPE pair counting ---

  test("c53: multiplicity is preserved — 'aaa' contributes 'aa' twice per occurrence") {
    val out = TextAnalysis.bpeMergePairsFrom(docs(1L -> "aaa bb aaa"))
      .select("merge_rank", "pair", "n_occurrences", "n_words")
      .as[(Long, String, Long, Long)].collect()
    // vocab: aaa (wc=2), bb (wc=1). aaa has positions 1,2 -> "aa","aa":
    // 2 per occurrence x 2 occurrences = 4. bb -> "bb": 1.
    assert(out.toSeq == Seq((1L, "aa", 4L, 1L), (2L, "bb", 1L, 1L)))
  }

  test("c53: single-char and empty tokens are excluded from the vocabulary") {
    val out = TextAnalysis.bpeMergePairsFrom(docs(1L -> "a b  cd"))
      .select("pair", "n_occurrences").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("cd", 1L)))
  }

  // --- c54 bigram surprise ---

  test("c54: conditional MLE on a hand-computable corpus") {
    // doc 1 "a b a b": bigrams (a,b) (b,a) (a,b); doc 2 "a b": (a,b).
    // Corpus bigrams: (a,b)x3, (b,a)x1; context counts a->3, b->1.
    // p(b|a)=3/3=1 and p(a|b)=1/1=1, so every -ln is exactly 0.
    val out = TextAnalysis.bigramSurpriseFrom(docs(1L -> "a b a b", 2L -> "a b"))
      .select("doc_id", "n_bigrams", "avg_surprise").as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 3L, 0.0), (2L, 1L, 0.0)))
  }

  test("c54: a surprising continuation scores higher than a deterministic one") {
    // "x y" twice and "x z" once: p(y|x)=2/3, p(z|x)=1/3.
    // doc 3 (the rare continuation) must out-surprise docs 1/2.
    val out = TextAnalysis.bigramSurpriseFrom(
      docs(1L -> "x y", 2L -> "x y", 3L -> "x z"))
      .select("doc_id", "avg_surprise").as[(Long, Double)].collect().toMap
    assert(out(3L) > out(1L))
    assert(out(1L) == out(2L))
    assert(math.abs(out(1L) - (-math.log(2.0 / 3.0))) < 1e-3)
    assert(math.abs(out(3L) - (-math.log(1.0 / 3.0))) < 1e-3)
  }

  test("c54: single-token docs produce no row") {
    val out = TextAnalysis.bigramSurpriseFrom(docs(1L -> "solo", 2L -> "a b"))
      .select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(2L))
  }

  test("c53: rank is dense 1..k and counts are non-increasing with pair-asc tiebreak") {
    val out = TextAnalysis.bpeMergePairsFrom(
      docs(1L -> "zz zz yy xx", 2L -> "yy xx ww"))
      .select("merge_rank", "pair", "n_occurrences").as[(Long, String, Long)].collect()
    assert(out.map(_._1).toSeq == (1L to out.length.toLong))
    out.sliding(2).foreach {
      case Array((_, pa, ca), (_, pb, cb)) =>
        assert(ca > cb || (ca == cb && pa < pb))
      case _ =>
    }
  }

  // --- c61 merge application ---

  private def langDocs(rows: (String, String)*) =
    rows.toSeq.toDF("lang", "text")

  test("c61: greedy left-to-right application — 'aaaa' merges twice, 'aaa' once") {
    // Vocab: aaab×2 (pairs aa:4, ab:2), aaaa×1 (aa:3), aaa×1 (aa:2) →
    // top pair "aa" with 9 occurrences. Application (non-overlapping):
    // aaab → _ab (1 merge), aaaa → __ (2), aaa → _a (1).
    val out = TextAnalysis.bpeApplyMergeFrom(
        langDocs("en" -> "aaab aaab aaaa", "de" -> "aaa"))
      .select($"lang", $"pair", $"n_carrier_tokens", $"n_symbols_before",
        $"n_merges", $"n_symbols_after")
      .as[(String, String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("de", "aa", 1L, 3L, 1L, 2L),
      ("en", "aa", 3L, 12L, 4L, 8L)))
  }

  test("c61: words without the pair contribute symbols but no merges") {
    val out = TextAnalysis.bpeApplyMergeFrom(langDocs("en" -> "aab aab cc"))
      .select($"pair", $"n_carrier_tokens", $"n_symbols_before", $"n_merges")
      .as[(String, Long, Long, Long)].head()
    // top pair: aa (2 occurrences, beats ab on count? aa:2, ab:2, cc:1 —
    // tie aa/ab broken pair-ascending → "aa"); cc carries no merge.
    assert(out == (("aa", 2L, 8L, 2L)))
  }

  // --- c60 importance weights ---

  test("c60: a target-vocabulary doc scores positive and selected; an out-domain doc negative") {
    // Target sources carry 'x'-speak, the rest 'y'-speak. A pure-x doc
    // must be more likely under the target model (selected=1), a
    // pure-y doc less (selected=0).
    val docs = Seq(
      (1L, "src0", "x x x"), (2L, "src1", "x x"),
      (3L, "src5", "y y y"), (4L, "src6", "y y x")
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.importanceWeightsFrom(docs)
      .select($"doc_id", $"log_weight", $"selected")
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(out(0)._2 > 0 && out(0)._3 == 1L, s"pure-target doc must select: $out")
    assert(out(2)._2 < 0 && out(2)._3 == 0L, s"out-domain doc must not: $out")
    // Monotonicity: more x-share ⇒ higher weight per token; doc 4 sits
    // between the pure docs.
    assert(out(3)._2 > out(2)._2 && out(3)._2 < out(0)._2)
  }

  test("c60: weights are partition-invariant (decimal canon)") {
    val docs = Seq((1L, "src0", "a b c a"), (2L, "src3", "b c d e"),
      (3L, "src1", "a a e"), (4L, "src9", "d d d"))
      .toDF("doc_id", "source", "text")
    val one = TextAnalysis.importanceWeightsFrom(docs.repartition(1))
      .select($"doc_id", $"log_weight").as[(Long, Double)].collect().sortBy(_._1).toSeq
    val many = TextAnalysis.importanceWeightsFrom(docs.repartition(32))
      .select($"doc_id", $"log_weight").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(one == many)
  }

  // --- c63 token entropy ---

  test("c63: all-distinct tokens give H = ln n and norm_entropy = 1; a one-token-type doc gives 0") {
    val d = Seq((1L, "en", "a b c d"), (2L, "en", "x x x x x"))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.tokenEntropyFrom(d)
      .select($"doc_id", $"entropy", $"norm_entropy")
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(math.abs(out(0)._2 - math.log(4.0)) < 1e-3, s"uniform H: ${out(0)}")
    assert(out(0)._3 == 1.0, s"uniform norm: ${out(0)}")
    assert(out(1)._2 == 0.0 && out(1)._3 == 0.0, s"degenerate: ${out(1)}")
  }

  test("c63: a stuck-loop doc scores below a varied doc of the same length") {
    val d = Seq((1L, "en", "spam spam spam spam spam spam spam ham"),
      (2L, "en", "one two three four five six seven eight"))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.tokenEntropyFrom(d)
      .select($"doc_id", $"entropy").as[(Long, Double)].collect().sortBy(_._1)
    assert(out(0)._2 < out(1)._2)
  }

  test("c63: entropy is partition-invariant (decimal canon)") {
    val d = (1L to 40L).map(i => (i, "en", s"t${i % 7} t${i % 3} t${i % 5} u$i"))
      .toDF("doc_id", "lang", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.tokenEntropyFrom(df)
        .select($"doc_id", $"entropy", $"norm_entropy")
        .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(run(d.repartition(1)) == run(d.repartition(32)))
  }

  // --- c65 vocab coverage ---

  test("c65: heavy skew needs few tokens; a uniform vocabulary needs 90% of it") {
    // skewed: 'z' covers 18/20 = 90% alone → vocab_90 = 1
    val skew = (1 to 18).map(_ => "z").mkString(" ") + " q r"
    // uniform: 10 tokens once each → vocab_90 = 9
    val flat = ('a' to 'j').mkString(" ")
    val out = TextAnalysis.vocabCoverageFrom(
      Seq(("sk", skew), ("fl", flat)).toDF("lang", "text"))
      .select($"lang", $"n_tokens", $"vocab_size", $"vocab_90", $"vocab_90_frac")
      .as[(String, Long, Long, Long, Double)].collect().sortBy(_._1).toMap2
    assert(out("sk") == ((20L, 3L, 1L, 0.3333)), s"skew: $out")
    assert(out("fl") == ((10L, 10L, 9L, 0.9)), s"flat: $out")
  }

  test("c65: vocab_90 never exceeds vocab_size on the fixture corpus") {
    val out = TextAnalysis.vocabCoverage(TestSpark.spark, TestSpark.sf0001)
      .select($"vocab_90", $"vocab_size").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (v90, vs) => assert(v90 >= 1L && v90 <= vs) }
  }

  // --- c78 BPE training loop ---

  test("c78: three greedy rounds compose marks — hand-traced on 'aaa aa b ab'") {
    // vocab {aaa, aa, b, ab}. Round 1: pairs aa:3 (overlap-counted:
    // "aaa" carries two), ab:1 → winner (aa,3); rewrite → {Aa, A, b,
    // ab}, 4 words, 6 symbols. Round 2: pairs Aa:1, ab:1 — tie, pair
    // asc picks "Aa" ('A' < 'a' in binary collation) → the MARK
    // composes with a letter; → {B, A, b, ab}, 5 symbols. Round 3:
    // only ab remains → (ab,1); → 4 symbols.
    val out = TextAnalysis.bpeTrainStepsFrom(docs(1L -> "aaa aa b ab"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "aa", 3L, 4L, 6L),
      (2L, "Aa", 1L, 4L, 5L),
      (3L, "ab", 1L, 4L, 4L)))
  }

  test("c78: post-merge vocabulary collisions sum their counts") {
    // {ab, aab, Xb?} — after winner "ab" ('ab':2 beats 'aa':1) both
    // "abb"→"Ab" and "aab"→"aA" stay distinct, but "ab"→"A" twice
    // over two docs collapses to one vocab row with wc=2: round 2
    // pair counts must see the SUMMED count, not duplicate rows.
    val out = TextAnalysis.bpeTrainStepsFrom(
      docs(1L -> "ab aab", 2L -> "ab abb"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // Round 1: ab:3 (two 'ab' + one in 'aab' + one in 'abb' = 4? no:
    // 'aab' pairs aa,ab; 'abb' pairs ab,bb; 'ab' pair ab ×2 → ab:4.
    assert(out.head == ((1L, "ab", 4L)))
    // Vocab after round 1: {A:2, aA:1, Ab:1}. Round 2 pairs: aA:1,
    // Ab:1 → tie → "Ab" ('A'+'b'=0x41 0x62) vs "aA" (0x61 0x41):
    // 'A' < 'a' so "Ab" wins.
    assert(out(1)._2 == "Ab" && out(1)._3 == 1L)
  }

  test("c153: the tie-corrected AUC equals the brute-force pair probability") {
    // AUC = P(score_pos > score_neg) + 0.5 P(=) over all pos×neg pairs
    // — recomputed directly from the score table at sf0.001 (500 docs)
    // and compared to the rank-formula output at its 1e-6 grain.
    val row = TextAnalysis.aucExact(spark, TestSpark.sf0001).collect().head
    val (nPos, nNeg, auc) =
      (row.getLong(0), row.getLong(1), row.getDouble(2))
    val scored = TextAnalysis.lqScores(spark, TestSpark.sf0001)
      .select(org.apache.spark.sql.functions.col("score"),
        (org.apache.spark.sql.functions.col("lang") === "en").as("y"))
      .as[(Double, Boolean)].collect()
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    assert(nPos == pos.length && nNeg == neg.length)
    var wins = 0.0
    for (p <- pos; n <- neg)
      wins += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val brute = wins / (pos.length.toDouble * neg.length)
    assert(math.abs(auc - brute) < 1e-6, s"auc=$auc brute=$brute")
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("c154: calibration bins cover every doc and the ECE re-derives from the rows") {
    val rows = TextAnalysis.calibrationBins(spark, TestSpark.sf0001)
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    val nDocs = Tables.t(spark, TestSpark.sf0001, "documents").count()
    assert(rows.map(_._2).sum == nDocs, "bins must cover every doc")
    assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0), "mean_p in [0,1]")
    assert(rows.forall(r => r._4 >= 0.0 && r._4 <= 1.0), "frac_pos in [0,1]")
    val eces = rows.map(_._6).distinct
    assert(eces.length == 1, "one ECE for the whole audit")
    // 1e-4-rounded per-bin gaps re-weighted must land within the
    // rounding grain of the emitted ECE.
    val rederived = rows.map(r => r._2 * r._5).sum / nDocs
    assert(math.abs(rederived - eces.head) < 1e-3,
      s"ece=${eces.head} rederived=$rederived")
  }

  test("c157: the PR table's counts reconcile and recall is monotone in the threshold") {
    val rows = TextAnalysis.prCurve(spark, TestSpark.sf0001)
      .select("bin", "tp", "fp", "fn", "recall")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    val nPos = rows.head._2 + rows.head._4
    rows.foreach { case (bin, tp, _, fn, _) =>
      assert(tp + fn == nPos, s"bin $bin: tp+fn != n_pos")
    }
    // lowest present threshold keeps everything => full recall
    assert(rows.head._2 == nPos, "lowest bin must capture every positive")
    val recalls = rows.map(_._5)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b },
      s"recall must not increase with the threshold: ${recalls.toSeq}")
  }

  test("c156: confusion rows partition the corpus and shares sum to 1 per actual language") {
    val rows = TextAnalysis.langConfusion(spark, TestSpark.sf0001)
      .as[(String, String, Long, Double)].collect()
    val nDocs = Tables.t(spark, TestSpark.sf0001, "documents").count()
    assert(rows.map(_._3).sum == nDocs, "cells must partition the corpus")
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      val share = cells.map(_._4).sum
      assert(math.abs(share - 1.0) < 1e-2, s"$lang shares sum to $share")
    }
  }

  private implicit class Map2Ops[A, B, C, D, E](rows: Array[(A, B, C, D, E)]) {
    def toMap2: Map[A, (B, C, D, E)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("c182: PMI pairs come from the top-df vocabulary; counts and pmi recomputed independently per pair") {
    val sf = TestSpark.sf0001
    val out = TextAnalysis.termPmi(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty && out.length <= TextAnalysis.PmiTopPairs)
    // Independent replay from the raw corpus: doc-level presence,
    // document frequency, the deterministic top-vocab cut, pair
    // co-occurrence by doc-set intersection, and the integer-count ln.
    val presence = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").distinct.map(w => (w, r.getLong(0))))
    val nDocs = Tables.t(spark, sf, "documents").count()
    val docsOf = presence.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).toSet }
    val vocab = docsOf.toSeq.map { case (w, ds) => (w, ds.size) }
      .sortBy { case (w, df) => (-df, w) }.take(TextAnalysis.PmiVocab).toMap
    def r4(d: Double) = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { case (a, b, dfA, dfB, nAb, pmi) =>
      assert(a < b, s"pair ($a,$b) not canonically ordered")
      assert(vocab.contains(a) && vocab.contains(b),
        s"pair ($a,$b) escapes the top-${TextAnalysis.PmiVocab} vocabulary")
      assert(dfA == vocab(a).toLong && dfB == vocab(b).toLong)
      val expectAb = (docsOf(a) & docsOf(b)).size.toLong
      assert(nAb == expectAb, s"($a,$b) co-occurrence drifted: $nAb vs $expectAb")
      assert(nAb >= 2)
      assert(pmi == r4(math.log(nAb.toDouble * nDocs / (dfA * dfB))),
        s"($a,$b) pmi drifted")
    }
    // The ranking is the stated one: pmi desc with lexicographic ties.
    val keys = out.map { case (a, b, _, _, _, p) => (-p, a, b) }
    assert(keys.sameElements(keys.sorted), "output order drifted from (pmi desc, a, b)")
  }

  test("c185: novelty replayed independently per test doc; only test docs emit; the fixture carries both ends") {
    val sf = TestSpark.sf0001
    val out = TextAnalysis.ngramNovelty(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.nonEmpty)
    def md5hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def splitOf(id: Long): String = {
      val b = md5hex(s"split:$id").take(2)
      if (b < "1a") "val" else if (b < "34") "test" else "train"
    }
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def gramsOf(t: String): Seq[String] = {
      val ws = t.split(" ")
      if (ws.length < 5) Seq.empty
      else (0 to ws.length - 5).map(i => ws.slice(i, i + 5).mkString(" "))
    }
    val trainSet = docs.filter(d => splitOf(d._1) == "train")
      .flatMap(d => gramsOf(d._2)).toSet
    val expect = docs.filter(d => splitOf(d._1) == "test")
      .map { case (id, t) =>
        val gs = gramsOf(t).distinct
        id -> (gs.length.toLong, gs.count(trainSet).toLong)
      }.filter(_._2._1 > 0).toMap
    assert(out.length == expect.size, "row set must be exactly the gram-bearing test docs")
    out.foreach { case (id, _, n, seen, nov) =>
      val (en, eseen) = expect(id)
      assert(n == en && seen == eseen, s"doc $id counts drifted")
      assert(nov == BigDecimal(1.0 - seen.toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(nov >= 0.0 && nov <= 1.0 && seen <= n)
    }
    // Non-vacuous both ways: the planted near-dups give some test doc
    // with memorized grams, and some doc stays (partly) novel.
    assert(out.exists(_._4 > 0), "no test doc shares any gram with train - audit vacuous")
    assert(out.exists(_._5 > 0.0), "every test doc fully memorized - audit vacuous")
  }

  test("c189: KN perplexity replays independently per test doc; smoothing scores what MLE cannot") {
    val sf = TestSpark.sf0001
    val out = TextAnalysis.knPerplexity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    def md5hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def splitOf(id: Long): String = {
      val b = md5hex(s"split:$id").take(2)
      if (b < "1a") "val" else if (b < "34") "test" else "train"
    }
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def bigramsOf(t: String): Seq[(String, String)] = {
      val ws = t.split(" ")
      if (ws.length < 2) Seq.empty else ws.dropRight(1).zip(ws.drop(1)).toSeq
    }
    // independent model build: train bigram counts and the three
    // derived KN tables, then the interpolated-KN probability
    val train = docs.filter(d => splitOf(d._1) == "train").flatMap(d => bigramsOf(d._2))
    val cvw = train.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val cv = cvw.groupBy(_._1._1).map { case (v, m) => v -> m.values.sum }
    val n1f = cvw.groupBy(_._1._1).map { case (v, m) => v -> m.size.toLong }
    val n1b = cvw.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val tt = cvw.size.toLong
    def p(v: String, w: String): Double = {
      val pcont = (n1b.getOrElse(w, 0L).toDouble + 1.0) / (tt.toDouble + 1.0)
      val cvv = cv.getOrElse(v, 0L)
      if (cvv > 0)
        (math.max(cvw.getOrElse((v, w), 0L).toDouble - 0.75, 0.0) +
          0.75 * n1f(v).toDouble * pcont) / cvv.toDouble
      else pcont
    }
    val expect = docs.filter(d => splitOf(d._1) == "test")
      .map { case (id, t) =>
        val bs = bigramsOf(t)
        val terms = bs.map { case (v, w) =>
          BigDecimal(-math.log(p(v, w))).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }
        val nll = // davgFloor6 replay: exact micro-unit sum, floored mean
          if (bs.isEmpty) 0.0
          else math.floor((terms.sum * 1000000).toLongExact.toDouble / bs.length) / 1000000.0
        id -> (bs.length.toLong, bs.count { case (v, w) => !cvw.contains((v, w)) }.toLong, nll)
      }.filter(_._2._1 > 0).toMap
    assert(out.length == expect.size, "row set must be exactly the bigram-bearing test docs")
    out.foreach { case (id, n, unseen, nll) =>
      val (en, eunseen, enll) = expect(id)
      assert(n == en && unseen == eunseen, s"doc $id counts drifted: ($n,$unseen) vs ($en,$eunseen)")
      assert(nll == enll, s"doc $id avg_nll drifted: $nll vs $enll")
      assert(nll > 0.0, s"doc $id scored non-positive NLL")
    }
    // The point of smoothing: held-out docs DO contain bigrams the
    // train split never saw (c54's MLE would assign p=0 and -ln p=inf
    // there), and every one of them still scored finitely above.
    assert(out.map(_._3).sum > 0, "no unseen bigram in any test doc - the held-out posture is vacuous")
    // the probability is a genuine (sub-)distribution: every scored
    // term sits in (0, 1], so avg_nll >= 0 with equality impossible
    // on mixed-vocabulary text
    assert(out.forall(_._4 > 0.0))
  }

  test("c196: the source-overlap matrix replays independently; the row-local pair fan loses no pair") {
    val sf = TestSpark.sf0001
    val out = TextAnalysis.sourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(out.nonEmpty)
    val docs = Tables.t(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def gramsOf(t: String): Seq[String] = {
      val ws = t.split(" ")
      if (ws.length < 5) Seq.empty
      else (0 to ws.length - 5).map(i => ws.slice(i, i + 5).mkString(" "))
    }
    // independent replay as the honest pairwise form: per-source
    // distinct gram sets, then every pair's intersection directly
    val sets = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.flatMap(d => gramsOf(d._2)).toSet }
    val srcs = sets.keys.toSeq.sorted
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      (a, b) = (srcs(i), srcs(j))
      sh = (sets(a) intersect sets(b)).size.toLong if sh > 0
    } yield (a, b) -> (sh, sets(a).size.toLong, sets(b).size.toLong,
      r4(sh.toDouble / (sets(a).size + sets(b).size - sh)),
      r4(sh.toDouble / math.min(sets(a).size, sets(b).size)))).toMap
    assert(out == expect,
      s"matrix drifted from the pairwise replay (missing=${(expect.keySet -- out.keySet).take(3)}, extra=${(out.keySet -- expect.keySet).take(3)})")
    // sanity on the statistics, and non-vacuity: the planted
    // near-dup families cross sources, so overlap exists but the
    // matrix is not saturated at this SF
    assert(out.values.forall { case (sh, na, nb, j, c) =>
      j >= 0 && j <= c && c <= 1.0 && sh <= math.min(na, nb) })
    assert(out.values.exists(_._5 > 0.0))
  }

  test("c201: the mixing plan replays the fixed largest-first greedy from the matrix's grain") {
    val sf = TestSpark.sf0001
    val out = TextAnalysis.sourceOverlapPlan(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5), r.getDouble(6))).toMap
    assert(out.nonEmpty)
    val docs = Tables.t(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def gramsOf(t: String): Seq[String] = {
      val ws = t.split(" ")
      if (ws.length < 5) Seq.empty
      else (0 to ws.length - 5).map(i => ws.slice(i, i + 5).mkString(" "))
    }
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sets = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.flatMap(d => gramsOf(d._2)).toSet }
    // the greedy, replayed literally: pick largest-first, credit each
    // source with the grams not covered by earlier picks
    val order = sets.toSeq.sortBy { case (s, g) => (-g.size, s) }.map(_._1)
    var covered = Set.empty[String]
    order.zipWithIndex.foreach { case (s, i) =>
      val novel = (sets(s) -- covered).size.toLong
      covered ++= sets(s)
      val (po, ng, nv, nf, dec, w) = out(s)
      assert(po == i + 1L && ng == sets(s).size.toLong && nv == novel,
        s"greedy accounting drifted at $s: got ($po,$ng,$nv)")
      val enf = r4(novel.toDouble / sets(s).size)
      assert(nf == enf)
      val (edec, ew) =
        if (enf >= 0.5) ("keep", 1.0)
        else if (enf >= 0.1) ("down_weight", enf)
        else ("drop", 0.0)
      assert(dec == edec && w == ew, s"decision drifted at $s: ($dec,$w) vs ($edec,$ew)")
    }
    // the marginal accounting is conservative: total novel grams
    // across sources equals the union size (each gram credited once)
    assert(out.values.map(_._3).sum == covered.size.toLong)
    // non-vacuity: on the planted cross-source near-dups some source
    // must lose grams to an earlier pick (novel_frac < 1 somewhere)
    assert(out.values.exists(_._4 < 1.0), "no overlap reached the plan - vacuous")
  }

  test("c202: the weighted mix consumes the plan's weights and its rates replay exactly") {
    val sf = TestSpark.sf0001
    val plan = TextAnalysis.sourceOverlapPlan(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(6)).toMap
    val out = TextAnalysis.weightedMix(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(out.nonEmpty && out.keySet == plan.keySet)
    def md5hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val (nTotal, nKept, rate, w, eff, actual) = out(src)
      assert(w == plan(src), s"$src: consumed weight drifted from the plan")
      val expRate = ((src.drop(3).toInt % 4) + 1).toDouble / 8.0
      assert(nTotal == ds.length.toLong && rate == expRate && eff == r4(expRate * w))
      val cut = math.floor(expRate * w * 256).toInt
      val kept = ds.count { case (id, _) =>
        Integer.parseInt(md5hex(s"mix:$id").take(2), 16) < cut }
      assert(nKept == kept.toLong, s"$src: membership drifted: $nKept vs $kept")
      assert(actual == r4(kept.toDouble / ds.length))
      // the weight is LIVE: a down-weighted/dropped source keeps fewer
      // docs than its raw c26 rate would have
      if (w < 1.0) {
        val rawCut = math.floor(expRate * 256).toInt
        val rawKept = ds.count { case (id, _) =>
          Integer.parseInt(md5hex(s"mix:$id").take(2), 16) < rawCut }
        assert(kept <= rawKept)
      }
    }
    // the fixture's 20 near-disjoint sources all legitimately KEEP
    // (novel_frac >= 0.5 everywhere at sf0.001) — so drive the
    // down-weight/drop branches on a constructed corpus through the
    // shared kernel: src1 is a pure subset of src0 (a redundant
    // re-dump) and must DROP; src2 half-overlaps and must DOWN-WEIGHT
    import spark.implicits._
    val base = (1 to 12).map(i =>
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i")
    val cons = (
      base.zipWithIndex.map { case (t, i) => (100L + i, "src0", t) } ++
      base.take(6).zipWithIndex.map { case (t, i) => (200L + i, "src1", t) } ++
      (base.take(3).zipWithIndex.map { case (t, i) => (300L + i, "src2", t) } ++
        Seq((310L, "src2", "wholly novel text with six tokens"))))
      .toDF("doc_id", "source", "text")
    val consPlan = TextAnalysis.overlapPlanOf(cons).collect()
      .map(r => r.getString(0) -> (r.getString(5), r.getDouble(6))).toMap
    assert(consPlan("src0") == ("keep", 1.0), s"biggest source must keep: $consPlan")
    assert(consPlan("src1")._1 == "drop" && consPlan("src1")._2 == 0.0,
      s"a pure-subset re-dump must drop: ${consPlan("src1")}")
    assert(consPlan("src2")._1 == "down_weight" &&
      consPlan("src2")._2 > 0.0 && consPlan("src2")._2 < 0.5,
      s"a half-overlapping source must down-weight to its novel fraction: ${consPlan("src2")}")
  }

  test("c186: the Zipf fit replays independently from raw term counts; r2 is a genuine fit quality") {
    val sf = TestSpark.sf0001
    val row = TextAnalysis.zipfFit(spark, sf).collect().head
    val (n, slope, intercept, r2) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
    // Independent replay: counts from raw text, (tf desc, w asc) rank
    // cut, decimal-quantized moment sums, the closed-form OLS. The
    // sf0.001 vocabulary is smaller than the 100-rank window, so the
    // fit runs on the whole head — n pins that.
    val tf = Tables.t(spark, sf, "documents")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" "))
      .groupBy(identity).map { case (w, xs) => (w, xs.length) }.toSeq
      .sortBy { case (w, c) => (-c, w) }.take(TextAnalysis.ZipfTopK)
    assert(n == tf.length.toLong,
      s"fit must use min(vocab, ${TextAnalysis.ZipfTopK}) points")
    def d6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val pts = tf.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble)) }
    val (sx, sy) = (pts.map(p => d6(p._1)).sum.toDouble, pts.map(p => d6(p._2)).sum.toDouble)
    val sxy = pts.map(p => d6(p._1 * p._2)).sum.toDouble
    val sxx = pts.map(p => d6(p._1 * p._1)).sum.toDouble
    val syy = pts.map(p => d6(p._2 * p._2)).sum.toDouble
    val nn = pts.length.toDouble
    val num = nn * sxy - sx * sy; val den = nn * sxx - sx * sx
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(slope == r4(num / den), s"slope drifted: $slope vs ${r4(num / den)}")
    assert(intercept == r4((sy - num / den * sx) / nn))
    assert(r2 == r4(num * num / (den * (nn * syy - sy * sy))))
    // Sanity on the statistics: rank-sorting makes the slope
    // non-positive, and r² is a valid fraction. The MEASURED values
    // are the audit's honest finding on this corpus: the synthetic
    // fixture's head is near-UNIFORM (slope ≈ −0.06, r² ≈ 0.06 at
    // sf0.001 — nothing like natural language's slope ≈ −1), which is
    // exactly the "this corpus is not natural text" signal the
    // operator exists to raise.
    info(s"c186 zipf fit at sf0.001: slope=$slope r2=$r2 n=$n")
    assert(slope <= 0.0, s"rank-frequency slope cannot be positive: $slope")
    assert(r2 >= 0.0 && r2 <= 1.0, s"r2 out of range: $r2")
  }

  test("c190: the Heaps fit replays independently from raw text; the fixture's closed vocabulary reads as beta = 0") {
    val sf = TestSpark.sf0001
    val row = TextAnalysis.heapsFit(spark, sf).collect().head
    val (n, beta, lnk, r2) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // independent replay: integer cuts over the id span, cumulative
    // token counts, first-occurrence vocabulary growth, the same
    // decimal-quantized OLS as the c186 replay
    val lo = docs.map(_._1).min; val hi = docs.map(_._1).max
    val cuts = (1 to TextAnalysis.HeapsPoints)
      .map(k => lo + (hi - lo) * k / TextAnalysis.HeapsPoints).distinct
    val firstOcc = docs.flatMap { case (id, t) => t.split(" ").map(_ -> id) }
      .groupBy(_._1).map { case (_, xs) => xs.map(_._2).min }.toSeq
    val pts = cuts.map { c =>
      val ntok = docs.filter(_._1 <= c).map(_._2.split(" ").length.toLong).sum
      val v = firstOcc.count(_ <= c).toLong
      (math.log(ntok.toDouble), math.log(v.toDouble))
    }
    assert(n == pts.length.toLong)
    def d6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val (sx, sy) = (pts.map(p => d6(p._1)).sum.toDouble, pts.map(p => d6(p._2)).sum.toDouble)
    val sxy = pts.map(p => d6(p._1 * p._2)).sum.toDouble
    val sxx = pts.map(p => d6(p._1 * p._1)).sum.toDouble
    val nn = pts.length.toDouble
    val num = nn * sxy - sx * sy; val den = nn * sxx - sx * sx
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(beta == r4(num / den), s"beta drifted: $beta vs ${r4(num / den)}")
    assert(lnk == r4((sy - num / den * sx) / nn))
    // The audit's honest finding on this corpus, pinned: every one of
    // the 31 synthetic types first occurs in the very first document
    // (vocabulary saturates immediately), so V is flat across all 10
    // checkpoints and the growth exponent is EXACTLY the "closed
    // template vocabulary" verdict beta = 0 — the opposite end of the
    // dial from the beta ~ 1 unbounded-novelty pathology, and nothing
    // like natural text's 0.4-0.6. A corpus report reading this fit
    // would conclude "templated/synthetic", which this corpus is.
    info(s"c190 heaps fit at sf0.001: beta=$beta lnK=$lnk r2=$r2 n=$n")
    // r17 ADVICE: the flat-vocabulary fit is 0/0-adjacent (num and the
    // y-variance term are ~1e-6 DECIMAL quantization residues), so pin
    // the VERDICT (beta ~ 0, e^lnK = V) without depending on the SIGN
    // of quantization noise: beta within 1e-3 of zero rather than
    // exactly 0.0, and r2 allowed to be NaN (0/0) or in-range.
    assert(math.abs(beta) < 1e-3, s"closed-vocabulary fixture must fit beta ~ 0: $beta")
    assert(math.exp(lnk).round == firstOcc.size.toLong,
      s"flat-V fit must put e^lnK at the vocabulary size: e^$lnk vs ${firstOcc.size}")
    assert(r2.isNaN || (r2 >= 0.0 && r2 <= 1.0), s"r2 out of range: $r2")
  }
}