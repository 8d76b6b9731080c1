package graft
import java.nio.file.{Files, Paths}
/** Optimization-round plan snapshots: dump `explain("formatted")` for
  * a comma-separated list of query keys to one file per key, so
  * before/after plan claims in OPTIMIZATION_r*.md are checkable
  * artifacts (plans/r18/<key>_<tag>.txt) rather than prose.
  *
  * Usage: runMain graft.PlanDump <keys> <outDir> <tag> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val keys = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = args(1)
    val tag = args(2)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { k =>
      val fn = SparkEntry.queries(k)
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${k}_$tag.txt"), plan)
      println(s"[plandump] wrote $outDir/${k}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
