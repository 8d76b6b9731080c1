package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Vintage hardening for the WHOLE query canon (round 11): the a18
  * class of bug — an operator whose output depends on which physical
  * form `events.ts` shipped in — must be CI-found, not driver-found.
  *
  * TablesSpec pins the three ts helpers on a single synthetic row;
  * this spec runs every events-consuming key in [[SparkEntry.queries]]
  * against a NANOS-vintage rewrite of the sf0.001 fixture (ts as
  * INT64 epoch-ns, the pre-round-10 physical form as it arrives under
  * `nanosAsLong`: LongType) and asserts the collected output is
  * row-for-row identical to the shipped µs-vintage run. Any key that
  * renders, buckets, windows, or joins on ts through an
  * engine-variant path diverges HERE, by key name.
  *
  * The events-consuming subset is detected from each key's ANALYZED
  * plan (the scan's root path), not hand-listed — a new events key is
  * covered the day it is registered.
  */
class VintageSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** sf0.001 with events rewritten to the nanos vintage; every other
    * table is a symlink to the read-only fixture file.
    */
  private lazy val nanosDir: String = {
    val dir = Files.createTempDirectory("graft_nanos_vintage")
    Tables.names.filterNot(_ == "events").foreach { t =>
      Files.createSymbolicLink(
        dir.resolve(s"$t.parquet"), Paths.get(s"${TestSpark.sf0001}/$t.parquet"))
    }
    // The nanos vintage as Spark 4 sees it under nanosAsLong: a plain
    // LongType column of epoch-NANOS (a re-written INT64 reads back as
    // LongType exactly like an annotated TIMESTAMP(NANOS) does under
    // the conf, which is the branch Tables.tsTimestamp must take).
    val ev = Tables.t(spark, TestSpark.sf0001, "events")
    ev.withColumn("ts", Tables.tsUs(ev) * lit(1000L))
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    dir.toString
  }

  private def readsEvents(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.exists(_.toString.endsWith("events.parquet"))
        case _ => false
      }
    }.exists(identity)

  private lazy val eventsKeys: Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn) if readsEvents(fn(spark, TestSpark.sf0001)) => name
    }

  test("the detected events-consuming subset is substantial") {
    // A refactor that reroutes scans (breaking the detection) must not
    // silently shrink this spec to zero coverage.
    assert(eventsKeys.size >= 10, s"only ${eventsKeys.size}: $eventsKeys")
    assert(eventsKeys.contains("b42_tumbling_window"))
    assert(eventsKeys.contains("a18_content_checksum"))
  }

  test("every events-consuming key is vintage-invariant at sf0.001") {
    // LongType nanos must reach tsTimestamp's LongType branch — guard
    // the sandbox itself before trusting 40 green comparisons.
    val tsType = Tables.t(spark, nanosDir, "events").schema("ts").dataType
    assert(tsType == org.apache.spark.sql.types.LongType,
      s"nanos sandbox read back as $tsType — the rewrite no longer " +
        "exercises the nanos branch")
    val diverged = eventsKeys.flatMap { name =>
      val fn = SparkEntry.queries(name)
      val us = fn(spark, TestSpark.sf0001).collect().toSeq
      val ns = fn(spark, nanosDir).collect().toSeq
      if (us == ns) None
      else Some(s"$name: ${us.size} vs ${ns.size} rows; first diff: " +
        us.zipAll(ns, null, null).find { case (a, b) => a != b }.toString)
    }
    assert(diverged.isEmpty,
      s"${diverged.size}/${eventsKeys.size} keys diverge across the " +
        s"events.ts vintage:\n${diverged.mkString("\n")}")
  }
}
