package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Canon, Tables}

/** Relational analytics surface (SURVEY §2 group B: scans, filters,
  * joins, aggregation, set ops, sort/limit).
  *
  * Scale posture: joins against `region`/`nation`/`customer`-sized
  * dimensions are explicitly `broadcast()` (they stay KB–GB while the
  * fact side grows to 100 TB); fact-fact joins shuffle on their join
  * keys and rely on AQE for skew/coalescing. Aggregations are plain
  * `groupBy.agg`, which Spark executes as partial (map-side) + final
  * hash aggregation — the shuffle carries one row per (partition,
  * group), not per input row.
  */
object Relational {
  import Canon._

  type Q = (SparkSession, String) => DataFrame

  /** b16 — TPC-H Q1 pricing summary (flagship). Scan + 8-way agg over
    * lineitem; 6 output groups regardless of scale.
    */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.t(spark, sfDir, "lineitem")
    val discPrice = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val charge =
      col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(discPrice).as("sum_disc_price"),
        dsum(charge).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val queries: Map[String, Q] = Map(
    "b16_q1_pricing_summary" -> (q1PricingSummary(_, _))
  )

  val oracle: Map[String, String] = Map(
    "b16_q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${oDsum("l_quantity")} AS sum_qty,
         |  ${oDsum("l_extendedprice")} AS sum_base_price,
         |  ${oDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${oDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  ${oDavg("l_quantity")} AS avg_qty,
         |  ${oDavg("l_extendedprice")} AS avg_price,
         |  ${oDavg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin
  )
}
