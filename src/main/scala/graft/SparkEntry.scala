package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Migration.queries ++ Relational.queries ++ Windows.queries ++
      Functions.queries ++ Llm.queries ++ NearDup.queries ++
      TextAnalysis.queries ++ Multimodal.queries ++ Retrieval.queries ++
      Analytics.queries ++ TpchSuite.queries ++ Insights.queries ++
      CurationRun.queries ++ graft.streaming.Streams.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables — since round 18 EVERY key ships one
    * (the b18/b50 sketch keys hash exact-side values plus
    * oracle-pinned within-bound verdicts; the sketch values stay
    * engine-private). */
  def oracleSql: Map[String, String] =
    Migration.oracle ++ Relational.oracle ++ Windows.oracle ++
      Functions.oracle ++ Llm.oracle ++ NearDup.oracle ++
      TextAnalysis.oracle ++ Multimodal.oracle ++ Retrieval.oracle ++
      Analytics.oracle ++ TpchSuite.oracle ++ Insights.oracle ++
      CurationRun.oracle ++ graft.streaming.Streams.oracle
}
