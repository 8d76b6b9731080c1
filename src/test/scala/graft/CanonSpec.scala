package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The determinism canon's core claim (Canon.scala, SURVEY §5.3 rule
  * 2): decimal-path sums are invariant under partitioning — the
  * property that makes results reproducible when partition counts
  * change 1000× between local[4] and a real cluster.
  */
class CanonSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val values = (1 to 10000).map(i => math.Pi * i * 0.37)

  test("dsum is identical at 1, 7, and 64 partitions") {
    val sums = Seq(1, 7, 64).map { p =>
      values.toDF("x").repartition(p)
        .agg(Canon.dsum(col("x"))).head().getDouble(0)
    }
    assert(sums.distinct.size == 1, s"partition-dependent dsum: $sums")
  }

  test("davg is identical at 1, 7, and 64 partitions") {
    val avgs = Seq(1, 7, 64).map { p =>
      values.toDF("x").repartition(p)
        .agg(Canon.davg(col("x"))).head().getDouble(0)
    }
    assert(avgs.distinct.size == 1, s"partition-dependent davg: $avgs")
  }

  test("raw double sum is NOT partition-stable (why the canon exists)") {
    val sums = Seq(1, 7, 64).map { p =>
      values.toDF("x").repartition(p)
        .agg(sum(col("x"))).head().getDouble(0)
    }
    // Not asserting inequality (could coincide), just documenting: the
    // decimal path above is the guarantee, this one has none.
    assert(sums.nonEmpty)
  }
}
