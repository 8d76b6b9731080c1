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

    // The expensive upstream: explode every token of every document,
    // shuffle to per-token counts — a corpus-sized explode + exchange
    // that cumLe would otherwise recompute per pass.
    def upstream = Tables.t(spark, sfDir, "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("tok"), col("cnt"), col("cnt").cast("double").as("v"))

    // Global exact rank of every token by frequency (tok ties the
    // order) — the same call shape as c153/c151's rank spines.
    def once(persist: Boolean): Double = {
      val t0 = System.nanoTime()
      val up = if (persist) upstream.persist(StorageLevel.MEMORY_AND_DISK)
      else upstream
      try {
        val ranked = ops.OrderStats.cumLe(up, grp = Seq.empty, tie = Seq("tok"))
        // Drain the full result (count + checksum of the ranks) so the
        // timer covers every pass, not a partial pull.
        ranked.agg(count(lit(1)), sum(col("cum_le"))).head()
        (System.nanoTime() - t0) / 1e9
      } finally if (persist) { up.unpersist(true); () }
    }
    def minOf2(persist: Boolean): Double = math.min(once(persist), once(persist))

    // Alternate cold/warm exposure: unpersisted first, persisted,
    // then re-measure unpersisted to show the ordering didn't gift
    // the persisted run a warm cache.
    val noP1 = minOf2(persist = false)
    val withP = minOf2(persist = true)
    val noP2 = minOf2(persist = false)
    val nTokens = upstream.count()
    println(s"""{"metric":"orderstats_persist_price","sf_dir":"$sfDir",""" +
      s""""distinct_tokens":$nTokens,""" +
      s""""wall_unpersisted_sec":${math.min(noP1, noP2)},""" +
      s""""wall_persisted_sec":$withP,""" +
      s""""unpersisted_runs":[$noP1,$noP2]}""")
    spark.stop()
  }
}
