package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming scale rehearsal (round-12 verdict item 8): drive the
  * five transformWithState PRODUCTION topologies — and their
  * oracle-verified legacy twins — against a 100×-events corpus under
  * `Trigger.AvailableNow`, and require EXACT emission equality
  * between the two state APIs at scale (the legacy topologies are the
  * driver-hash-verified keys, so tws-equality IS the batch-oracle
  * match transported to 100×). Prints one JSON line per topology:
  * wall seconds for both APIs, emission count, distinct state keys
  * (every kernel holds exactly one bounded tuple per user — the state
  * bound BY DESIGN), and the two-way exceptAll diff (must be 0).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_ev100 sbt "runMain graft.StreamScale"
  */
object StreamScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/tmp/graft_ev100")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .appName("graft-stream-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.Streams
    val ev = Tables.t(spark, sfDir, "events")
    val users = ev.select("user_id").distinct().count()
    val events = ev.count()
    System.err.println(s"[stream-scale] $sfDir: $events events, $users users")
    val topos: Seq[(String,
        (SparkSession, String) => DataFrame,
        (SparkSession, String) => DataFrame)] = Seq(
      ("c83_scd2", Streams.streamScd2(_, _), Streams.streamScd2Tws(_, _)),
      ("c129_interval_coalesce", Streams.streamIntervalCoalesce(_, _),
        Streams.streamIntervalCoalesceTws(_, _)),
      ("c136_ewma", Streams.streamEwma(_, _), Streams.streamEwmaTws(_, _)),
      ("c149_gap_histogram", Streams.streamGapHistogram(_, _),
        Streams.streamGapHistogramTws(_, _)),
      ("c150_session_paths", Streams.streamSessionPaths(_, _),
        Streams.streamSessionPathsTws(_, _)))
    topos.zipWithIndex.foreach { case ((tag, legacy, tws), i) =>
      // Wall covers ONLY stream execution: the topology functions run
      // their bounded query eagerly (runToParquet awaits termination
      // during construction); the sink re-read count and the exceptAll
      // diffs below are batch jobs and stay OUTSIDE the timer
      // (round-13 ADVICE — the old timing folded the re-read in).
      def run(f: (SparkSession, String) => DataFrame): (Double, Long, DataFrame) = {
        val t0 = System.nanoTime()
        val df = f(spark, sfDir)
        val wall = (System.nanoTime() - t0) / 1e9
        (wall, df.count(), df)
      }
      // Alternate which API runs first per topology: the first run of
      // each pair absorbs scheduler/code warm-up, so pinning legacy
      // first biased wall_legacy high (round-13 ADVICE). Over the five
      // topologies each API runs first for ~half.
      val legacyFirst = i % 2 == 0
      val ((wallLegacy, nLegacy, dfLegacy), (wallTws, nTws, dfTws)) =
        if (legacyFirst) { val l = run(legacy); (l, run(tws)) }
        else { val t = run(tws); (run(legacy), t) }
      val diff = dfLegacy.exceptAll(dfTws).count() + dfTws.exceptAll(dfLegacy).count()
      println(s"""{"topology":"$tag","wall_legacy_sec":$wallLegacy,""" +
        s""""wall_tws_sec":$wallTws,"ran_first":"${if (legacyFirst) "legacy" else "tws"}",""" +
        s""""emissions":$nLegacy,""" +
        s""""emissions_tws":$nTws,"state_keys":$users,"diff_rows":$diff}""")
      require(diff == 0L, s"$tag: tws emissions diverge from the legacy twin")
    }
    spark.stop()
  }
}
