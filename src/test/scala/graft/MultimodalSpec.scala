package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** The multimodal binary plumbing (Multimodal.scala): the
  * mapPartitions decoder path must produce the same features as the
  * native-function path, over the same binary column, regardless of
  * partitioning.
  */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("mapPartitions decoder path matches native binary features") {
    val native = Multimodal.binaryFeatures(spark, TestSpark.sf0001)
      .select($"doc_id", $"n_bytes", $"checksum", $"head_hex")
      .as[(Long, Long, String, String)].collect().sortBy(_._1)
    val viaParts = Multimodal.featuresViaPartitions(spark, TestSpark.sf0001)
      .select($"doc_id", $"n_bytes", $"checksum", $"head_hex")
      .as[(Long, Long, String, String)].collect().sortBy(_._1)
    assert(native.length == viaParts.length && native.nonEmpty)
    assert(native.sameElements(viaParts))
  }

  test("decoder path is partition-count invariant") {
    val base = Multimodal.featuresViaPartitions(spark, TestSpark.sf0001)
      .collect().map(f => (f.doc_id, f.checksum)).sortBy(_._1)
    val repart = Multimodal.mediaTable(spark, TestSpark.sf0001)
      .repartition(13)
      .select($"doc_id", $"content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => Multimodal.fakeDecodeFeatures(id, b) })
      .collect().map(f => (f.doc_id, f.checksum)).sortBy(_._1)
    assert(base.sameElements(repart))
  }

  test("media metadata struct carries type information") {
    val schema = Multimodal.mediaTable(spark, TestSpark.sf0001).schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
  }

  test("real decode is an explicit stub") {
    intercept[UnsupportedOperationException] {
      Multimodal.decodeImage(Array[Byte](1, 2, 3))
    }
  }

  /** The c42 oracle formerly hard-capped the frame budget at 1024
    * frames (64 KB of content); docs past that would silently diverge
    * from Spark. Pin the uncapped semantics: for synthetic docs well
    * past 64 KB (and the empty/tiny edge cases), frameSample must
    * equal an independent reimplementation of the per-row slicing
    * formula (frame=16 B, stride=4 frames → every 64th byte offset).
    */
  test("frame sampling has no frame-count cap (>64 KB docs, edge sizes)") {
    def expected(text: String): (Long, Long, Long, String) = {
      val bytes = text.getBytes("UTF-8")
      val n = bytes.length
      val nFrames = math.ceil(n / 16.0).toLong
      val budget = math.max((n - 1) / 64, 0) + 1
      val sampled = (0 until budget.toInt).flatMap { f =>
        bytes.slice(f * 64, math.min(f * 64 + 16, n))
      }.toArray
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(sampled).map("%02x".format(_)).mkString
      (n.toLong, nFrames, budget.toLong, md5)
    }
    // 100k and 200k chars are 1.5x / 3x past the old 64 KB cap.
    val docs = Seq(
      1L -> "x" * 200000,
      2L -> ("abcdefgh" * 12500),  // 100k
      3L -> "short",
      4L -> "",
      5L -> "y" * 65536,           // exactly the old cap boundary
      6L -> "z" * 65537)           // one past it
    val media = docs.toDF("doc_id", "text").select(
      $"doc_id",
      to_binary($"text", lit("utf-8")).as("content"),
      struct(lit("text/plain").as("mime"),
        length($"text").cast("long").as("n_chars"),
        lit("en").as("lang")).as("meta"))
    val got = Multimodal.frameSampleOf(media)
      .select($"doc_id", $"n_bytes", $"n_frames", $"n_sampled", $"sampled_md5")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.length == docs.length)
    docs.zip(got).foreach { case ((id, text), (gid, nb, nf, ns, md5)) =>
      val (enb, enf, ens, emd5) = expected(text)
      assert(gid == id)
      assert((nb, nf, ns, md5) == (enb, enf, ens, emd5),
        s"doc $id (${text.length} chars)")
    }
  }

  test("c164: duplicated frames found within and across media; keeper is the lexicographic first; blobs stay out of the shuffle") {
    // Synthetic blobs with KNOWN 16-byte-aligned duplicates:
    //   frame "AAAAAAAAAAAAAAAA" at doc 1 idx 0, doc 1 idx 2 (within-
    //   doc repeat) and doc 3 idx 1 (cross-doc) → 3 occurrences,
    //   2 docs, keeper (1, 0);
    //   frame "BBBBBBBBBBBBBBBB" at doc 2 idx 0 and doc 3 idx 0 →
    //   2 occurrences, 2 docs, keeper (2, 0).
    // Every other frame is unique and must NOT appear.
    val fA = "A" * 16; val fB = "B" * 16
    val docs = Seq(
      1L -> (fA + ("c" * 16) + fA),
      2L -> (fB + ("d" * 16)),
      3L -> (fB + fA + ("e" * 7))) // ragged tail frame, unique
    val media = docs.toDF("doc_id", "text").select(
      $"doc_id",
      to_binary($"text", lit("utf-8")).as("content"),
      struct(lit("text/plain").as("mime"),
        length($"text").cast("long").as("n_chars"),
        lit("en").as("lang")).as("meta"))
    def h(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = Multimodal.frameDedupOf(media)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(got.keySet == Set(h(fA), h(fB)), s"wrong duplicate set: ${got.keySet}")
    assert(got(h(fA)) == ((3L, 2L, 1L, 0L)), s"fA: ${got(h(fA))}")
    assert(got(h(fB)) == ((2L, 2L, 2L, 0L)), s"fB: ${got(h(fB))}")
    // Scale pin: the hash projection runs inside the Generate — the
    // binary `content` column must not survive past the explode into
    // the aggregate's exchange (only doc_id/frame_idx/frame_md5 do).
    val p = Multimodal.frameDedupOf(media).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // The plan prints top-down, so "content is only used BELOW every
    // exchange" (i.e. the blob never ships) is: the first content#
    // reference comes after the last Exchange line.
    assert(p.contains("Exchange") && p.contains("content#"), p)
    assert(p.indexOf("content#") > p.lastIndexOf("Exchange"),
      s"blob column crosses an exchange:\n$p")
  }

  test("c85: group counts from length arithmetic match a positional brute force") {
    // cnt(g, n) must equal |{p in 1..n : ((p-1) % 32) div 4 == g}|.
    for (n <- Seq(0, 1, 4, 6, 31, 32, 36, 63, 64, 100); g <- 0 until 8) {
      val expected = (1 to n).count(p => ((p - 1) % 32) / 4 == g)
      val got = spark.range(1)
        .select(expr(Multimodal.groupCountExpr(g, n.toString, "div")).cast("long"))
        .head().getLong(0)
      assert(got == expected, s"cnt(g=$g, n=$n): got $got expected $expected")
    }
  }

  test("c85: an identical-distribution blob ranks first with cos 1.0") {
    // Probe = doc 1. Doc 2 has the same byte in every position → every
    // group mean equal → cos exactly 1.0 and rank 1. Doc 3's means
    // differ across groups → cos < 1.
    val docs = Seq(
      1L -> ("a" * 40), 2L -> ("a" * 72),
      3L -> ("ab" * 20 + "zzzz" * 9))
    val media = docs.toDF("doc_id", "text").select(
      $"doc_id", to_binary($"text", lit("utf-8")).as("content"),
      struct(lit("text/plain").as("mime"),
        length($"text").cast("long").as("n_chars"),
        lit("en").as("lang")).as("meta"))
    val out = Multimodal.mediaEmbedTopkOf(media)
      .as[(Long, Long, Double)].collect()
    assert(out.head == ((1L, 2L, 1.0)), s"top hit: ${out.head}")
    assert(out(1)._2 == 3L && out(1)._3 < 1.0, s"second: ${out(1)}")
  }

  test("c85: the encoder swap seam reproduces the SQL kernel bit-for-bit, any batch size") {
    // The worked swap (SCALE.md round 11): encodedFeatures is the one
    // function a real model replaces; handing it the JVM reference
    // encoder must reproduce the codegen'd SQL features EXACTLY (both
    // sides are integer byte sums over the same patch grid, then one
    // int/int double division), and the downstream top-k must be the
    // unchanged c85 answer. Batch size 1 and 7 exercise the batching
    // path including the ragged tail.
    val media = Multimodal.mediaTable(spark, TestSpark.sf0001)
    val sql = Multimodal.sqlFeatures(media).orderBy("doc_id").collect().toSeq
    for (bs <- Seq(1, 7, 64)) {
      val swapped = Multimodal.encodedFeatures(media, batchSize = bs)(
        Multimodal.groupMeanEncode).orderBy("doc_id").collect().toSeq
      assert(swapped == sql, s"batchSize=$bs: seam diverges from SQL kernel")
    }
    val viaSeam = Multimodal.topkFromFeatures(
      Multimodal.encodedFeatures(media)(Multimodal.groupMeanEncode))
      .as[(Long, Long, Double)].collect().toSeq
    val direct = Multimodal.mediaEmbedTopk(spark, TestSpark.sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    assert(viaSeam == direct, "top-k through the seam diverges from c85")
  }

  test("c85: the seam rejects an encoder that breaks the 8-dim contract") {
    val media = Multimodal.mediaTable(spark, TestSpark.sf0001)
    val bad = Multimodal.encodedFeatures(media)(blobs => blobs.map(_ => Array(1.0)))
    val e = intercept[org.apache.spark.SparkException] { bad.collect() }
    assert(e.getMessage != null)
  }

  /** Construct a media frame from (doc_id, text) pairs. */
  private def mediaFrom(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text").select(
      $"doc_id",
      to_binary($"text", lit("utf-8")).as("content"),
      struct(lit("text/plain").as("mime"),
        length($"text").cast("long").as("n_chars"),
        lit("en").as("lang")).as("meta"))

  test("c165: incoming media gate against the base frame store — constructed hits, misses, and the intra-batch exclusion") {
    // isIncoming is the md5 deal — pick ids on each side so every
    // case is constructed, not sampled.
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def isInc(id: Long): Boolean =
      BigInt(md5hex(s"inc:$id").take(15), 16) % 5 == 0
    val incIds = Iterator.from(1).map(_.toLong).filter(isInc).take(3).toSeq
    val baseIds = Iterator.from(1).map(_.toLong).filterNot(isInc).take(2).toSeq
    val fX = "X" * 16; val fY = "Y" * 16; val fZ = "Z" * 16
    val media = mediaFrom(Seq(
      baseIds(0) -> (fX + fY),          // base: frames X, Y
      baseIds(1) -> fX,                 // base: X again (count 2 in store)
      incIds(0) -> (fX + ("u" * 16)),   // incoming: 1 of 2 hits → 0.5 → skip_store
      incIds(1) -> (fZ + ("v" * 16)),   // incoming: Z only shared with ANOTHER
      incIds(2) -> (fZ + ("w" * 16))))  //   incoming doc — must NOT count
    val got = Multimodal.incFrameGateOf(media)
      .as[(Long, Long, Long, Double, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(got.keySet == Set(incIds(0), incIds(1), incIds(2)),
      s"every incoming doc gets exactly one decision: $got")
    assert(got(incIds(0)) == ((2L, 1L, 0.5, "skip_store")), s"${got(incIds(0))}")
    // Z is incoming×incoming — intra-batch dups are c164's job, not the gate's.
    assert(got(incIds(1)) == ((2L, 0L, 0.0, "store")), s"${got(incIds(1))}")
    assert(got(incIds(2)) == ((2L, 0L, 0.0, "store")), s"${got(incIds(2))}")
  }

  test("c166 kernel: per-frame reference rows point at the canonical base keeper; blobs stay below every exchange") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def isInc(id: Long): Boolean =
      BigInt(md5hex(s"inc:$id").take(15), 16) % 5 == 0
    val incIds = Iterator.from(1).map(_.toLong).filter(isInc).take(1).toSeq
    val baseIds = Iterator.from(1).map(_.toLong).filterNot(isInc).take(2).toSeq
    val fX = "X" * 16
    val media = mediaFrom(Seq(
      baseIds(0) -> (("a" * 16) + fX),  // X at (base0, 1)
      baseIds(1) -> fX,                 // X at (base1, 0)
      incIds(0) -> (fX + fX)))          // two incoming occurrences of X
    val keeper = Seq(baseIds(0) -> 1L, baseIds(1) -> 0L).minBy(identity)
    val got = Multimodal.frameHitsOf(media, Multimodal.baseFrameStore(media))
      .as[(Long, Long, String, Long, Long, Long)].collect().sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (incIds(0), 0L, md5hex(fX), keeper._1, keeper._2, 2L),
      (incIds(0), 1L, md5hex(fX), keeper._1, keeper._2, 2L)), got.mkString(","))
    // The c164 discipline holds on the probe path too: no Exchange —
    // shuffle OR broadcast — ever carries the blob column (the c164
    // textual check assumes a single-chain plan; this one has a join,
    // so walk the tree instead).
    val plan = Multimodal.frameHitsOf(media, Multimodal.baseFrameStore(media))
      .queryExecution.executedPlan match {
        // collect() does not descend into an AQE root's captured plan
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e }
    assert(exchanges.nonEmpty, plan.toString)
    exchanges.foreach(e => assert(!e.output.exists(_.name == "content"),
      s"blob column crosses an exchange:\n$plan"))
  }
}
