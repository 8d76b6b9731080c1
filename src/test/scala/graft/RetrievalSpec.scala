package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Retrieval

/** Pinned-value tests for the retrieval/selection kernels (c70-c72)
  * on hand-built documents, where the BM25 arithmetic and the Gopher
  * rule booleans can be stated exactly.
  */
class RetrievalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  // --- c70 BM25 ---

  test("c70: score matches the hand-applied Okapi formula and ranks by tf") {
    // Corpus: y appears 6 times (query rank 1), x 4 times (rank 2).
    val out = Retrieval.bm25TopkFrom(docs(
        1L -> "x x x y", 2L -> "x y", 3L -> "y y y y"))
      .select("q", "qrank", "rn", "doc_id", "tf", "score")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    // Hand arithmetic for score(y, d3): df(y)=3, N=3, dl(d3)=4, avgdl=10/3.
    val idfY = math.log((3 - 3 + 0.5) / (3 + 0.5) + 1.0)
    val s3 = BigDecimal(idfY * (4 * 2.2) / (4 + 1.2 * (0.25 + 0.75 * 4 / (10.0 / 3))))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head._1 == "y" && out.head._2 == 1L)
    // d3 (tf 4) first; among the tf-1 docs, d2's dl 2 < d1's dl 4 so
    // length normalization ranks d2 above d1.
    val yRows = out.filter(_._1 == "y")
    assert(yRows.map(_._4) == Seq(3L, 2L, 1L))
    assert(yRows.head._6 == s3)
    // x ranks: d1 (tf 3) above d2 (tf 1); d3 has no x and emits no row.
    val xRows = out.filter(_._1 == "x")
    assert(xRows.map(_._4) == Seq(1L, 2L) && xRows.map(_._3) == Seq(1L, 2L))
  }

  test("c70: higher tf wins at equal dl; idf of an everywhere-term stays positive") {
    val out = Retrieval.bm25TopkFrom(docs(
        1L -> "a a a b", 2L -> "a b b b", 3L -> "a b a b"))
      .select("q", "doc_id", "rn", "score").as[(String, Long, Long, Double)]
      .collect().toSeq
    // Both terms occur in all 3 docs (df = N) — the +1 inside ln keeps
    // every score strictly positive (the Lucene-style floor).
    assert(out.forall(_._4 > 0))
    // Per term, rank 1 is the doc with the highest tf (all dl equal).
    assert(out.filter(r => r._1 == "a" && r._3 == 1L).map(_._2) == Seq(1L))
    assert(out.filter(r => r._1 == "b" && r._3 == 1L).map(_._2) == Seq(2L))
  }

  // --- c71 weighted sampling ---

  private def wdocs(rows: (Long, Long)*) =
    rows.toSeq.map { case (id, w) => (id, "en", w) }.toDF("doc_id", "lang", "n_chars")

  test("c71: n <= k returns every doc, ordered by ascending race key") {
    val out = Retrieval.weightedSampleFrom(wdocs(
        1L -> 100L, 2L -> 200L, 3L -> 300L, 4L -> 50L))
      .select("rn", "doc_id", "key").as[(Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_._3) == out.map(_._3).sorted)
    assert(out.map(_._2).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("c71: the sample is a pure function of (doc_id, weight) — rerun is identical") {
    val d = wdocs((1L to 200L).map(i => i -> (50L + i)): _*)
    val a = Retrieval.weightedSampleFrom(d).collect().toSeq
    val b = Retrieval.weightedSampleFrom(d).collect().toSeq
    assert(a == b && a.size == 100)
  }

  test("c71: an overwhelming weight wins the exponential race") {
    // key = -ln(u)/w: with w 10^9 times larger and u bounded away from
    // 1 by the md5 grain, doc 999's key is orders of magnitude smaller.
    val out = Retrieval.weightedSampleFrom(
        wdocs((1L to 50L).map(i => i -> 10L) :+ (999L -> 10000000000L): _*))
      .select("rn", "doc_id").as[(Long, Long)].collect().toSeq
    assert(out.head == (1L, 999L))
  }

  // --- c72 Gopher gate ---

  private def gdocs(rows: (Long, String)*) =
    rows.toSeq.map { case (id, t) => (id, "en", t) }.toDF("doc_id", "lang", "text")

  test("c72: a well-formed doc passes all four rules") {
    // 52 words, mean length in [3,10], all alphabetic, 2 stopwords.
    val text = (("the" +: "a" +: Seq.fill(50)("word")): Seq[String]).mkString(" ")
    val out = Retrieval.gopherGateFrom(gdocs(1L -> text))
      .select("n_words", "r_wc", "r_mwl", "r_alpha", "r_stop", "n_failed", "passes")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Long, Boolean)].collect().head
    assert(out == ((52L, true, true, true, true, 0L, true)))
  }

  test("c72: each rule fails independently and n_failed counts them") {
    val short = "the and word"       // 3 words: r_wc fails (mean len 10/3 passes)
    val longWords = (("the" +: "a" +: Seq.fill(50)("antidisestablishment")): Seq[String]).mkString(" ")
    val digits = (("the" +: "a" +: Seq.fill(50)("1234")): Seq[String]).mkString(" ")
    val noStop = Seq.fill(52)("word").mkString(" ")
    val out = Retrieval.gopherGateFrom(gdocs(
        1L -> short, 2L -> longWords, 3L -> digits, 4L -> noStop))
      .select("doc_id", "r_wc", "r_mwl", "r_alpha", "r_stop", "n_failed")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, false, true, true, true, 1L)))     // 3 words
    assert(out(2L) == ((2L, true, false, true, true, 1L)))     // mean len > 10
    assert(out(3L) == ((3L, true, true, false, true, 1L)))     // digit words
    assert(out(4L) == ((4L, true, true, true, false, 1L)))     // no stopwords
  }

  test("c72: mean word length is the exact char_sum/n_words ratio") {
    // 50x "abc" (3) + "of" (2) + "in" (2): 154 chars / 52 words.
    val text = ((Seq.fill(50)("abc") :+ "of" :+ "in"): Seq[String]).mkString(" ")
    val out = Retrieval.gopherGateFrom(gdocs(1L -> text))
      .select("mean_word_len").as[Double].collect().head
    assert(out == BigDecimal(154.0 / 52)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("c155: rr is the reciprocal of the first relevant rank and mrr is their mean") {
    val rows = Retrieval.mrrEval(spark, TestSpark.sf0001)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.length == 5, "one row per panel query")
    rows.foreach { case (_, _, first, rr, _) =>
      if (first > 0)
        assert(rr == BigDecimal(1.0 / first)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          s"rr != round(1/$first, 6): $rr")
      else assert(rr == 0.0, "no relevant doc in list => rr = 0")
    }
    val mrrs = rows.map(_._5).distinct
    assert(mrrs.length == 1, "one MRR for the panel")
    assert(math.abs(mrrs.head - rows.map(_._4).sum / rows.length) < 1e-6)
  }
}
