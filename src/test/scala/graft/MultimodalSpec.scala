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
}
