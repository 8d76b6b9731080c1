package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

/** Salting is an algebraic rewrite: salted results must equal the
  * unsalted plan's results exactly, on pathologically skewed data
  * (one key = 90% of rows).
  */
class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 9000 rows of key 0, ~1000 spread over keys 1..10
  private lazy val skewed = (
    (1 to 9000).map(i => (0L, i.toLong)) ++
    (1 to 1000).map(i => ((i % 10 + 1).toLong, i.toLong))
  ).toDF("k", "v").repartition(8)

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy($"k")
      .agg(sum($"v").as("sum_value"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val salted = Skew.saltedSumCount(skewed, $"k", $"v", 16, $"v")
      .select($"_k", $"sum_value", $"n")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(plain.sameElements(salted))
  }

  test("salted join equals plain join") {
    val dim = (0L to 10L).map(k => (k, s"name$k")).toDF("dk", "name")
    val plain = skewed.join(dim, $"k" === $"dk")
      .groupBy($"name").count()
      .as[(String, Long)].collect().sortBy(_._1)
    val salted = Skew.saltedJoin(skewed, dim, $"k", $"dk", 16, $"v")
      .groupBy($"name").count()
      .as[(String, Long)].collect().sortBy(_._1)
    assert(plain.sameElements(salted))
  }

  test("salt actually spreads the hot key") {
    val spread = skewed.where($"k" === 0)
      .withColumn("_salt", pmod(hash($"v"), lit(16)))
      .select($"_salt").distinct().count()
    assert(spread > 8, s"hot key only landed in $spread salt buckets")
  }
}
