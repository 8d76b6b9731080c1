package graft
import org.apache.spark.sql.SparkSession

/** The engine's local session posture, shared by the three entry
  * points (Verify / Bench / Recall) so the scale-critical settings
  * cannot drift between them:
  *
  *  - `shuffle.partitions = cpus` as the non-AQE floor;
  *  - AQE ON, planning every exchange from
  *    `initialPartitionNum = 256` and coalescing on measured sizes —
  *    a no-op at fixture scale, the thing that keeps 100× sorts
  *    mergeable inside executor memory (the 4g rehearsal's OOM was
  *    the spill READERS' unmanaged read-ahead buffers once a task
  *    had spilled hundreds of files — SCALE.md round 9);
  *  - `advisoryPartitionSizeInBytes = 16m`, because the advisory is
  *    measured on COMPRESSED shuffle bytes and embedding-array rows
  *    decompress ~5-10× worse than scalars (c47's 4g OOM);
  *  - UTC + ns-as-long (events.parquet carries ns timestamps) + no UI.
  */
object Sessions {
  def local(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
