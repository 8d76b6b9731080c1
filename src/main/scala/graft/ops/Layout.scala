package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout-at-rest tools (SURVEY §1.1: Cassandra's partition-key
  * + clustering layout IS Spark's bucket + sortWithinPartitions
  * contract; the brief's "bucketing for co-located joins").
  *
  * Bucketing pre-pays the shuffle once at write time: two tables
  * bucketed by the same key into the same bucket count join with NO
  * exchange on either side — at 100 TB that's the difference between
  * re-shuffling the fact table per query and never shuffling it.
  * LayoutSpec asserts the exchange-free plan.
  */
object Layout {

  /** Write a frame bucketed (and sorted) by key — the Cassandra
    * "partition key + clustering column" layout on parquet. Requires
    * a table name (bucket metadata lives in the catalog).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
    buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    sortCol.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  /** Re-layout a frame for a downstream co-located merge: hash
    * repartition on the key + sort within partitions — the in-flight
    * equivalent of [[writeBucketed]] for single-job pipelines.
    */
  def clusterBy(df: DataFrame, key: String, partitions: Int,
    sortCols: String*): DataFrame =
    df.repartition(partitions, col(key))
      .sortWithinPartitions((key +: sortCols).map(col): _*)

  /** Size-bounded output files (the small-files defence): cap rows per
    * file and coalesce tiny outputs — at 100 TB, file-count hygiene is
    * a first-class operator.
    */
  def writeSized(df: DataFrame, path: String, maxRecordsPerFile: Long): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
}
