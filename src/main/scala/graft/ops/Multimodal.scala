package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing (north-star group): media as opaque
  * `binary` columns with typed metadata, plus feature extraction over
  * partitions.
  *
  * This container has no image/audio codecs, so the DECODE step is a
  * stub ([[decodeImage]], clearly marked) and [[fakeDecodeFeatures]]
  * is the deterministic stand-in used by tests — but everything
  * Spark-side is real: the binary column, the metadata struct schema,
  * the partition-wise batch processing shape (`mapPartitions`, the
  * Scala twin of `mapInPandas` batch UDFs), and the downstream joins.
  * Fixture media = the document text's UTF-8 bytes (a real, verifiable
  * byte payload).
  *
  * Scale posture: media bytes never shuffle — metadata and features
  * are projected per-row (narrow) and only the small feature/metadata
  * columns move; at 100 TB the binary column stays columnar-pruned
  * out of every query that doesn't touch it.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** Feature row produced per media blob by the (stub) decoder. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: String,
    head_hex: String, byte_mean: Double)

  /** REAL decode is impossible in this container (no codecs).
    * Production implementation would decode image/audio bytes here
    * (e.g. via javax.imageio / a JNI codec), emitting pixel/sample
    * features. Tests use [[fakeDecodeFeatures]] instead.
    */
  def decodeImage(bytes: Array[Byte]): Nothing =
    throw new UnsupportedOperationException(
      "stub: no media codecs in this environment — use fakeDecodeFeatures")

  /** Deterministic fake decoder: byte statistics standing in for
    * decoded-pixel features. Same signature/shape a real decoder
    * would have; exercised per-partition in tests.
    */
  def fakeDecodeFeatures(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    val mean = if (bytes.isEmpty) 0.0
      else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
    MediaFeatures(
      doc_id = docId,
      n_bytes = bytes.length.toLong,
      checksum = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString,
      head_hex = bytes.take(8).map("%02x".format(_)).mkString,
      byte_mean = math.round(mean * 10000.0) / 10000.0)
  }

  /** The media table: documents' text re-materialized as an opaque
    * binary `content` column + typed metadata struct — the ingest
    * shape for any media type.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "documents").select(
      col("doc_id"),
      to_binary(col("text"), lit("utf-8")).as("content"),
      struct(
        lit("text/plain").as("mime"),
        length(col("text")).cast("long").as("n_chars"),
        col("lang").as("lang")).as("meta"))

  /** c18 — binary-column feature extraction, entirely in native
    * (codegen'd) functions: byte length, content digest, head bytes.
    * The per-partition decoder path is [[featuresViaPartitions]]
    * (same outputs, mapPartitions shape) — unit-tested equivalent.
    */
  def binaryFeatures(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).select(
      col("doc_id"),
      length(col("content")).cast("long").as("n_bytes"),
      md5(col("content")).as("checksum"),
      lower(hex(expr("substring(content, 1, 8)"))).as("head_hex"),
      col("meta.n_chars").as("n_chars"),
      col("meta.lang").as("lang"))
      .orderBy("doc_id")

  /** The batch-UDF shape: decode per partition (one codec init per
    * partition, not per row — the property that matters when the
    * decoder is expensive). Output equals [[binaryFeatures]]'s shared
    * columns; asserted in MultimodalSpec.
    */
  def featuresViaPartitions(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would go here
        rows.map { case (id, bytes) => fakeDecodeFeatures(id, bytes) }
      }
  }

  val queries: Map[String, Q] = Map(
    "c18_multimodal_binary" -> (binaryFeatures(_, _))
  )

  val oracle: Map[String, String] = Map(
    // DuckDB sees the same bytes by casting the text to BLOB (UTF-8).
    "c18_multimodal_binary" ->
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  md5(text) AS checksum,
        |  lower(hex(CAST(substr(text, 1, 8) AS BLOB))) AS head_hex,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  lang
        |FROM documents
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin
  )
}
