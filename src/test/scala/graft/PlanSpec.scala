package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Physical-plan audits (the 100 TB posture, SURVEY §2 C10 / §4):
  * these assertions pin the *plan shape*, not timings — filters reach
  * the parquet scan, projections prune columns, small dims broadcast,
  * top-k fuses to TakeOrderedAndProject, and nothing falls back to an
  * unbounded cartesian product. A regression here is a scale-killer
  * long before it's a slow benchmark.
  */
class PlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("b6: predicates are pushed to the parquet scan") {
    val p = plan(Relational.filterComplex(spark, sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("In(o_orderstatus") || p.contains("o_orderstatus"), p)
  }

  test("b16: scan reads only the 7 needed lineitem columns") {
    val p = plan(Relational.q1PricingSummary(spark, sf))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"unpruned scan: $readSchema")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
  }

  test("b7: dimension joins are broadcast, fact side stays shuffle-free pre-agg") {
    val p = plan(Relational.joinBroadcastDims(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("b29: top-k fuses into TakeOrderedAndProject (no global sort)") {
    val p = plan(Relational.q3TopkRevenue(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("c4: probe is broadcast and top-k fuses (no shuffle over the corpus)") {
    val p = plan(Llm.cosineTopk(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("Broadcast"), p)
  }

  test("c2: LSH candidate join is an equi-join on band buckets, not cartesian") {
    val p = plan(Llm.dedupMinhashPairs(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("c12: near-dup pair join is an equi-join on the cell id, not cartesian") {
    val p = plan(NearDup.embeddingNearDup(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("c5: corpus never explodes — centroids broadcast, cosine per row") {
    // The round-2 plan posexploded every embedding to 64 rows and
    // shuffle-joined on (label, idx): 64× corpus through an Exchange.
    // The rewrite broadcasts the n_labels-row centroid-array table, so
    // the only Exchange left is the per-label top-3 window.
    // (The centroid build still posexplodes, but its Exchange carries
    // only map-side-combined (label, idx) partials — 640 rows per
    // partition — not corpus rows.)
    val p = plan(Llm.knnPerLabel(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"centroids not broadcast: $p")
    assert(!p.contains("Exchange hashpartitioning(vec_id"),
      s"per-vector re-aggregate shuffle (the 64x corpus Exchange) is back: $p")
  }

  test("c19: batched ANN — probes broadcast, per-probe top-k prunes map-side") {
    val p = plan(NearDup.batchAnnTopk(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"probe set not broadcast: $p")
    assert(p.contains("WindowGroupLimit"),
      s"rank filter not pushed below the exchange: $p")
  }

  test("b13: range join is an equi-join on user_id with a band filter") {
    val p = plan(Windows.rangeJoin(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("b16 agg is two-phase (map-side partial + final) hash aggregation") {
    val p = plan(Relational.q1PricingSummary(spark, sf))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_sum"), s"no map-side partial aggregation: $p")
  }
}
