package graft
import org.apache.spark.sql.SparkSession

/** Standalone ANN-recall measurement (dev/rehearsal entry point):
  * runs [[Verify.annRecallReport]] — c13/c38 recall@5 and c12 banded
  * pair recall vs the exact brute-force oracle — on
  * `SPARK_GRAFT_SF_DIR`, which only needs the embeddings table.
  * Verify embeds the same report into ACCURACY.json at the driver's
  * fixture; this main exists so the 10×/100× scale corpora (documents
  * + embeddings only, no lineitem) can be measured too (SCALE.md's
  * recall ladder).
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE plans every exchange from a HIGH initial partition count
      // and coalesces down on measured sizes: at fixture scale this is
      // a no-op (coalesced back to ~cpus), at 100x it is what keeps
      // per-task sorts small enough to merge within executor memory.
      // The 4g memory rehearsal found the cliff: with
      // shuffle.partitions = cpus alone, a 100x sort-merge join spills
      // hundreds of files per task and the merge phase's UNMANAGED
      // read-ahead buffers (1 MiB per spill file) OOM the heap before
      // managed memory ever gets a say (SCALE.md round 9).
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      // Advisory post-shuffle partition size is measured on COMPRESSED
      // shuffle bytes; embedding-array rows decompress ~5-10x worse
      // than scalar columns, so the 64 MiB default hands a 4 GiB
      // executor ~0.5 GiB-heap tasks in the pair joins (c47's OOM in
      // the 4g rehearsal). 16 MiB keeps the widest rows' tasks inside
      // a sane per-core budget; scalar-only shuffles just get a few
      // more (cheap) tasks.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val report = "{\n\"sf_dir\": \"" + sfDir + "\",\n" +
      Verify.annRecallReport(spark, sfDir) + "\n}"
    spark.stop()
    println(report)
  }
}
