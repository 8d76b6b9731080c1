package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Mini-oracle (SURVEY §5.4): every declared query key executes on
  * sf0.001 with a stable non-empty schema, and every oracle key refers
  * to a declared query. Catches breakage before the driver's t2 gate.
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

  test("every query key except the sketch ops has oracle SQL") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("b18_approx_distinct", "b50_approx_quantiles"),
      s"unexpected no-oracle keys: $noOracle")
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
      val n = df.queryExecution.toRdd.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}
