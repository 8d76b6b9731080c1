package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, FloatType, MapType, StructType}

/** Mini-oracle (SURVEY §5.4): every declared query key executes on
  * sf0.001 with a stable non-empty schema, and every oracle key refers
  * to a declared query. Catches breakage before the driver's t2 gate.
  *
  * Round 12 adds two whole-canon CI rules that previously existed only
  * as scaladoc discipline — c137/c148/c151 shipped global rank windows
  * in the round AFTER c94's "never a global ntile" scaladoc was
  * written, which is exactly the failure mode a prose-only rule
  * permits:
  *
  *   - **No partition-less WindowExec outside the whitelist** (§5.3
  *     rule 9): an empty partitionSpec moves the window's whole input
  *     to ONE task — the classic 100 TB scale-killer over
  *     event/user/doc-scaled input. The bounded exceptions (windows
  *     over group-sized side tables) are whitelisted BY KEY with their
  *     boundedness justification.
  *   - **No DECIMAL/FLOAT final emissions** (§5.3 rule 10): the
  *     driver's comparator hashes rendered values after a
  *     Spark-parquet → python and a DuckDB → python round trip, and
  *     exotic numeric emissions render engine-specifically — a18 was
  *     red for TWO rounds on a DECIMAL(38,0) column whose digits
  *     matched to the last digit. Exact decimal algebra stays
  *     INTERNAL; the final select casts to string/long/double.
  */
class MiniOracleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** §5.3 rule 5: the driver's comparator (pandas sort → factorize)
    * cannot hash ArrayType/MapType/StructType cells — round 2 shipped
    * three red keys that way. Complex types must be flattened
    * (concat_ws / scalar columns) before the final projection.
    */
  private def isComplex(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  /** §5.3 rule 10: comparator-hazardous numeric emissions. */
  private def isHazardousEmission(dt: DataType): Boolean = dt match {
    case _: DecimalType | FloatType => true
    case _ => false
  }

  /** Full physical traversal: children, expression subqueries, the AQE
    * input plan, and cached-relation plans (a window hidden behind an
    * InMemoryTableScan still executed somewhere).
    */
  private def sweep(p: SparkPlan): Seq[SparkPlan] = {
    val extra = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case s: InMemoryTableScanExec => Seq(s.relation.cachedPlan)
      case _ => Nil
    }
    p +: (p.children ++ p.subqueries ++ extra).flatMap(sweep)
  }

  /** Keys allowed to carry a partition-less WindowExec, each with the
    * reason its window INPUT is bounded (group-sized or
    * constant-sized) — never event/user/doc-scaled. Kept exact by the
    * trailing dead-entry test: an entry whose key no longer carries a
    * global window must be removed.
    */
  private val globalWindowWhitelist: Map[String, String] = Map(
    "b81_abc_classification" -> ("cumulative windows over the ~25-row " +
      "BRAND aggregate (scaladoc'd)"),
    "c53_bpe_merge_pairs" -> ("merge_rank AFTER .limit(BpeTopK) — the " +
      "window orders a constant-sized top-k, never the pair vocab"),
    "c61_bpe_apply_merge" -> "inherits c53's post-limit rank (same kernel)",
    "c70_bm25_topk" -> ("qrank AFTER .limit(Bm25Queries=5) — scaladoc'd " +
      "'orders 5 rows, never the vocabulary'"),
    "c71_weighted_sample" -> ("rank AFTER .limit(SampleK=100) — the " +
      "top-k itself fuses to TakeOrderedAndProject"),
    "c85_media_embed_topk" -> ("rank over the 8 constant-size folds " +
      "(only 8 doubles move — scaladoc'd)"),
    "c92_kaplan_meier" -> ("at-risk/survival windows over the ≤ span-days " +
      "lifetime table — calendar-bounded, never user-scaled"),
    "c97_rrf_fusion" -> ("qrank over the 5-query panel; per-query ranks " +
      "are partitioned + WindowGroupLimit-capped"),
    "c103_ndcg_eval" -> "inherits c97's bounded query-panel ranks",
    "c155_mrr_eval" -> "inherits c97's bounded query-panel ranks",
    "c127_largest_remainder_alloc" -> ("largest-remainder ranks over the " +
      "≤ 25-row nation share table"),
    "c132_sharded_topk_bounds" -> "rank over the 20-row published-list union",
    "c186_zipf_fit" -> ("rank AFTER .limit(ZipfTopK=100) — the c53 " +
      "rank-after-limit discipline: the window orders the 100 cut " +
      "survivors, never the vocabulary"),
    "c197_join_skew_audit" -> ("rank AFTER .limit(SkewTopK=3) per audited " +
      "key — the c186 rank-after-limit discipline: the window orders the " +
      "3 TakeOrdered survivors, never the key space"),
    "c201_source_overlap_plan" -> ("pick-order rank over the ≤#sources " +
      "gram-count aggregate (scaladoc'd: sources-bounded, never the " +
      "gram table)"),
    "c202_weighted_mix" -> "inherits c201's sources-bounded pick-order rank")

  /** Keys observed carrying a global window during the per-key tests
    * (feeds the dead-entry check).
    */
  private val observedGlobalWindows = scala.collection.mutable.Set.empty[String]

  // Keys whose result can legitimately be empty at sf0.001 (tiny
  // fixtures: no never-ordered parts, no order-less customers).
  private val mayBeEmpty = Set(
    "b9_join_left_unmatched", "b11_join_anti", "b33_except",
    "b13_join_range", "c2_dedup_minhash_pairs", "c3_jaccard_pairs",
    "c11_ngram_jaccard_pairs", "c12_embedding_near_dup",
    "c43_containment_pairs", "c77_interval_overlap_join",
    // 60 lines/supplier at sf0.001 cannot produce a 20%-year tail
    // (the threshold is 1.3σ there); live from sf0.01 up.
    "b75_q20_excess_shippers")

  test("oracleSql keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle SQL without a query: $missing")
  }

  test("every query key has oracle SQL (b18/b50 joined the gate in round 18)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"unexpected no-oracle keys: $noOracle")
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes on sf0.001") {
      val df = fn(spark, TestSpark.sf0001)
      assert(df.schema.nonEmpty, "empty schema")
      val complex = df.schema.fields.filter(f => isComplex(f.dataType))
      assert(complex.isEmpty,
        s"complex-typed output columns (driver comparator can't hash " +
          s"them): ${complex.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}")
      val hazardous = df.schema.fields.filter(f => isHazardousEmission(f.dataType))
      assert(hazardous.isEmpty,
        s"DECIMAL/FLOAT final emissions (§5.3 rule 10 — the a18 " +
          s"comparator hazard; cast to string/long/double at the final " +
          s"select): ${hazardous.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}")
      val globals = sweep(df.queryExecution.executedPlan).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (globals.nonEmpty) observedGlobalWindows += name
      assert(globals.isEmpty || globalWindowWhitelist.contains(name),
        s"partition-less WindowExec (§5.3 rule 9 — single-task " +
          s"scale-killer; use the OrderStats.cumLe two-pass idiom or " +
          s"whitelist WITH a boundedness justification): " +
          s"${globals.size} global window(s)")
      val n = df.queryExecution.toRdd.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("global-window whitelist carries no dead entries") {
    val dead = globalWindowWhitelist.keySet -- observedGlobalWindows
    assert(dead.isEmpty,
      s"whitelisted keys no longer carry a global window — remove: $dead")
  }
}
