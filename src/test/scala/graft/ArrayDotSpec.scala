package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.ArrayDot

/** The codegen'd dot kernel must be BIT-IDENTICAL to the declarative
  * `aggregate(zip_with(...))` fold it replaced — same left-to-right
  * double accumulation, same NULL semantics (any null element, or a
  * length mismatch, nulls the result). Hash-parity with the DuckDB
  * oracle rests on this equivalence, so it is pinned here over
  * generated data, under forced codegen AND forced interpretation.
  */
class ArrayDotSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default.withSize(40), Seed(i.toLong)))

  private val vecGen: Gen[(List[Float], List[Float])] = for {
    n <- Gen.choose(1, 96)
    mk = Gen.listOfN(n, Gen.chooseNum(-1e6f, 1e6f,
      0.0f, Float.MinPositiveValue, 1.0f, -1.0f, 0.1f))
    a <- mk
    b <- mk
  } yield (a, b)

  private def foldDot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("adot == zip_with/aggregate fold, bit for bit, on generated float vectors") {
    val rows = samples(vecGen, 40)
    val df = rows.toDF("a", "b")
      .select(ArrayDot.adot(col("a"), col("b")).as("fast"),
        foldDot(col("a"), col("b")).as("slow"))
      .collect()
    assert(rows.nonEmpty && df.nonEmpty)
    df.foreach { r =>
      val (fast, slow) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToRawLongBits(fast) ==
        java.lang.Double.doubleToRawLongBits(slow),
        s"FP divergence from the fold: $fast vs $slow")
    }
  }

  test("adot NULL semantics match the fold: null element and length mismatch") {
    val df = Seq(
      (Seq[java.lang.Float](1.0f, null, 3.0f), Seq[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (Seq[java.lang.Float](1.0f, 2.0f, 3.0f), Seq[java.lang.Float](1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
      .select(ArrayDot.adot(col("a"), col("b")).as("fast"),
        foldDot(col("a"), col("b")).as("slow"))
      .collect()
    df.foreach(r => assert(r.isNullAt(0) == r.isNullAt(1),
      s"null-semantics divergence: $r"))
    assert(df.count(_.isNullAt(0)) == 2)
  }

  test("adot resolves in a fresh newSession whose plans come from Tables.t") {
    // newSession() gets its own function registry; Tables.t (the seam
    // every operator reads through) must have registered the kernel
    // there, independent of which session is thread-active.
    val s2 = spark.newSession()
    val n = Tables.t(s2, TestSpark.sf0001, "embeddings")
      .select(ArrayDot.adot(col("embedding"), col("embedding")).as("sq"))
      .where(col("sq") > 0).count()
    assert(n > 0)
  }

  test("adot survives CODEGEN_ONLY (no silent interpreter fallback) and mixed float/double") {
    // factoryMode=CODEGEN_ONLY makes a broken doGenCode throw instead
    // of falling back to eval — proving the kernel really compiles.
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.get(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val r = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(0.5, 0.25, 2.0)))
        .toDF("f", "d")
        .select(ArrayDot.adot(col("f"), col("d")).as("v"),
          ArrayDot.adot(col("d"), col("d")).as("dd"))
        .collect().head
      assert(r.getDouble(0) == 1.0 * 0.5 + 2.0 * 0.25 + 3.0 * 2.0)
      assert(r.getDouble(1) == 0.25 + 0.0625 + 4.0)
    } finally spark.conf.set(key, old)
  }
}
