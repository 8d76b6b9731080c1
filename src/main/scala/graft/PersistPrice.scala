package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Prices [[graft.ops.OrderStats]]' persist rule with a measurement
  * (round-13 verdict item 8): the kernel's contract says a caller
  * whose UPSTREAM is expensive (joins, explodes, multi-table
  * pipelines) should persist before calling, because the two-pass
  * rank evaluates its input ~3× (bounds aggregate, per-bucket
  * totals, within-bucket window). No current caller pays that —
  * they all pass tally-sized or single-scan inputs — so the rule has
  * carried no number. This main builds the deliberately expensive
  * upstream a future caller would bring (corpus-wide token explode →
  * shuffle → frequency tally, then a GLOBAL exact rank of tokens by
  * frequency) and times the same cumLe call with and without
  * MEMORY_AND_DISK persist on the upstream, min-of-2 each, printing
  * one JSON line. Run it on a 10× docs corpus per SCALE.md:
  *
  *   python scripts/gen_scale.py /root/testdata/sf0.1 /tmp/graft_scale10 10
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale10 sbt "runMain graft.PersistPrice"
  */
object PersistPrice {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/tmp/graft_scale10")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .appName("graft-persist-price").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Two upstream grades, bracketing the contract's regime boundary:
    // TALLY — token explode + map-side-combined count (the shape every
    // CURRENT caller passes: recompute is a fast scan, persist should
    // LOSE); HEAVY — bigram explode + wide-cardinality shuffle + a
    // self-join back to token counts (the joins/explodes pipeline the
    // contract warns about: recompute pays the full exchange 3×).
    def tally = Tables.t(spark, sfDir, "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("tok"), col("cnt"), col("cnt").cast("double").as("v"))
    def heavy = {
      val toks = Tables.t(spark, sfDir, "documents")
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("ws"))
        .select(col("doc_id"), expr(
          "transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i+1]))")
          .as("bgs"))
        .select(explode(col("bgs")).as("bg"))
      val bgCounts = toks.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
      val headCounts = tally.select(col("tok"), col("cnt").as("head_cnt"))
      bgCounts
        .withColumn("head", split(col("bg"), " ").getItem(0))
        .join(headCounts, col("head") === col("tok"))
        .select(col("bg").as("tok"), col("cnt"),
          (col("cnt").cast("double") / col("head_cnt")).as("v"))
    }

    // Global exact rank of every row by frequency (tok ties the
    // order) — the same call shape as c153/c151's rank spines.
    val verbose = sys.env.contains("SPARK_GRAFT_PP_VERBOSE")
    def once(up0: => org.apache.spark.sql.DataFrame, persist: Boolean): Double = {
      val t0 = System.nanoTime()
      val up = if (persist) up0.persist(StorageLevel.MEMORY_AND_DISK) else up0
      try {
        if (persist && verbose) {
          up.count()
          System.err.println(s"[pp] materialize=${(System.nanoTime() - t0) / 1e9}")
        }
        val ranked = ops.OrderStats.cumLe(up, grp = Seq.empty, tie = Seq("tok"))
        // Drain the full result (count + checksum of the ranks) so the
        // timer covers every pass, not a partial pull.
        val drain = ranked.agg(count(lit(1)), sum(col("cum_le")))
        drain.head()
        if (verbose) {
          // Post-execution plan: AQE finalizes exchange reuse only
          // after the query runs (formatted mode shows the final
          // adaptive plan; toString shows the initial one).
          val p = drain.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          System.err.println(s"[pp] persist=$persist exchanges=" +
            "Exchange ".r.findAllIn(p).length +
            s" reused=${"ReusedExchange".r.findAllIn(p).length}")
        }
        val w = (System.nanoTime() - t0) / 1e9
        if (verbose) System.err.println(s"[pp] persist=$persist total=$w")
        w
      } finally if (persist) { up.unpersist(true); () }
    }
    def minOf2(up0: => org.apache.spark.sql.DataFrame, persist: Boolean): Double =
      math.min(once(up0, persist), once(up0, persist))

    // Alternate cold/warm exposure: unpersisted first, persisted,
    // then re-measure unpersisted to show the ordering didn't gift
    // the persisted run a warm cache.
    def price(name: String, up0: => org.apache.spark.sql.DataFrame): String = {
      val noP1 = minOf2(up0, persist = false)
      val withP = minOf2(up0, persist = true)
      val noP2 = minOf2(up0, persist = false)
      val tc = System.nanoTime()
      val n = up0.count()
      val oneEval = (System.nanoTime() - tc) / 1e9
      s""""$name":{"rows":$n,"one_eval_sec":$oneEval,""" +
        s""""wall_unpersisted_sec":${math.min(noP1, noP2)},""" +
        s""""wall_persisted_sec":$withP,"unpersisted_runs":[$noP1,$noP2]}"""
    }
    println(s"""{"metric":"orderstats_persist_price","sf_dir":"$sfDir",""" +
      price("tally_upstream", tally) + "," + price("heavy_upstream", heavy) + "}")
    spark.stop()
  }
}
