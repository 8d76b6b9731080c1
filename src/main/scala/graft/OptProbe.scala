package graft
import org.apache.spark.sql.functions._
/** Scratch micro-bench used during the r18 optimization round (not a
  * bench/verify surface): times sub-plans of a key so per-stage cost
  * claims in OPTIMIZATION_r18.md are measured, not guessed.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[t] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    locally {
      val dd = Tables.t(spark, sf, "documents")
      val pres = ops.TextAnalysis.gramPresence(dd)
      time("c196 pres once")(pres.queryExecution.toRdd.count())
      time("c196 pres once2")(pres.queryExecution.toRdd.count())
      time("c196 full")(ops.TextAnalysis.sourceOverlap(spark, sf).queryExecution.toRdd.count())
      time("c201 full")(ops.TextAnalysis.sourceOverlapPlan(spark, sf).queryExecution.toRdd.count())
      time("c202 full")(ops.TextAnalysis.weightedMix(spark, sf).queryExecution.toRdd.count())
    }
    // exchange-reuse experiment + c188 shape test
    locally {
      val dd = Tables.t(spark, sf, "documents")
      val inst = ops.NearDup.cdcInstancesOf(dd)
      time("c188 inst once")(inst.queryExecution.toRdd.count())
      time("c188 inst once2")(inst.queryExecution.toRdd.count())
      time("c188 full")(ops.NearDup.cdcChunkDedup(spark, sf).queryExecution.toRdd.count())
      time("c188 full2")(ops.NearDup.cdcChunkDedup(spark, sf).queryExecution.toRdd.count())
      val byFpSrc = inst.groupBy(col("fp"), col("source"))
        .agg(count(lit(1)).as("cnt"), sum(col("clen")).as("sc"),
          min(col("doc_id")).as("md"), max(col("clen")).as("mx"))
      val bySrc = byFpSrc.groupBy(col("source"))
        .agg(sum(col("cnt")).as("n_chunks"), sum(col("sc")).as("n_chars"))
      val owned = byFpSrc.groupBy(col("fp"))
        .agg(min(struct(col("md"), col("source"))).as("o"), max(col("mx")).as("clen"))
        .groupBy(col("o.source").as("source"))
        .agg(count(lit(1)).as("n_owned"), sum(col("clen")).as("owned_chars"))
      val j = bySrc.join(owned, Seq("source"), "left")
      time("c188 restructured")(j.queryExecution.toRdd.count())
      time("c188 restructured2")(j.queryExecution.toRdd.count())
      val ep = j.queryExecution.executedPlan.toString
      println("[reuse] ReusedExchange in final plan: " + ep.contains("ReusedExchange") + " / stages: " + ep.count(_ == '\n'))
    }
    // setup probes
    time("setup vec: ivf")(ops.NearDup.writeIvfIndexStore(spark, sf))
    time("setup vec: codebook")(ops.NearDup.writePqCodebookStore(spark, sf))
    time("setup vec: codes")(ops.NearDup.writePqCodesStore(spark, sf))
    time("setup ingest")(ops.NearDup.writeRebuiltIndexStore(spark, sf))
    time("setup bands")(ops.Llm.warmBands(spark, sf))
    time("setup labels")(ops.NearDup.warmLabels(spark, sf))
    time("setup grams")(ops.NearDup.warmGrams(spark, sf))
    // c121 sub-stages
    locally {
      val dd = Tables.t(spark, sf, "documents")
      val grams = ops.Insights.sourceGrams(dd)
      time("c121 grams")(grams.queryExecution.toRdd.count())
      time("c121 grams2")(grams.queryExecution.toRdd.count())
      time("c121 full1")(ops.Insights.kmvPairOverlap(spark, sf).queryExecution.toRdd.count())
      time("c121 full2")(ops.Insights.kmvPairOverlap(spark, sf).queryExecution.toRdd.count())
    }
    val docs = Tables.t(spark, sf, "documents")
    val fp = docs.select(col("doc_id"), expr(
      "concat_ws('|', slice(array_sort(transform(sequence(1, greatest(length(text) - 4, 1), 4), i -> md5(substring(text, i, 5)))), 1, 4))")
      .as("fingerprint"))
    time("c17 noSort")(fp.queryExecution.toRdd.count())
    time("c17 orderBy")(fp.orderBy("doc_id").queryExecution.toRdd.count())
    time("c17 barrier+orderBy")(fp.repartition(col("doc_id")).orderBy("doc_id").queryExecution.toRdd.count())
    time("c17 orderBy again")(fp.orderBy("doc_id").queryExecution.toRdd.count())
    time("c17 barrier again")(fp.repartition(col("doc_id")).orderBy("doc_id").queryExecution.toRdd.count())
    time("warmSimhash")(ops.NearDup.warmSimhash(spark, sf))
    val wide = ops.NearDup.simhashWideTable(spark, sf)
    time("wide scan")(wide.queryExecution.toRdd.count())
    println("wide partitions: " + wide.rdd.getNumPartitions + " rows " + wide.count())
    val n = ops.NearDup.docCount(spark, sf)
    println("docCount " + n + " blockW " + ops.NearDup.simhashBlockW(n))
    time("c59 run1")(ops.NearDup.simhashHammingPairs(spark, sf).queryExecution.toRdd.count())
    time("c59 run2")(ops.NearDup.simhashHammingPairs(spark, sf).queryExecution.toRdd.count())
    val bits = 4 * ops.NearDup.simhashBlockW(n)
    val prints = wide.select(col("doc_id"), shiftright(col("v"), 60 - bits).as("v"))
    time("prints only")(prints.queryExecution.toRdd.count())
    val blockW = bits / 4
    val mask = (1L << blockW) - 1
    def blockOf(v: String, j: String) =
      s"(shiftright($v, $bits - $blockW * ($j + 1)) & $mask)"
    val probes = prints
      .select(col("doc_id"), col("v"),
        explode(expr((0 until 4).map(j =>
          s"struct($j AS blk, ${blockOf("v", j.toString)} AS bval)")
          .mkString("array(", ", ", ")"))).as("p"))
      .select(col("doc_id"), col("v"), col("p.blk").as("blk"),
        col("p.bval").as("bval"))
    time("probes only")(probes.queryExecution.toRdd.count())
    val a = probes.select(col("doc_id").as("doc_a"), col("v").as("va"),
      col("blk"), col("bval"))
    val b = probes.select(col("doc_id").as("doc_b"), col("v").as("vb"),
      col("blk").as("blk_b"), col("bval").as("bval_b"))
    val joined = a.join(b, col("blk") === col("blk_b") &&
      col("bval") === col("bval_b") && col("doc_a") < col("doc_b"))
    time("join only")(joined.queryExecution.toRdd.count())
    val guarded = joined.where(expr(s"NOT exists(sequence(0, 3), " +
      s"j -> j < blk AND ${blockOf("va", "j")} = ${blockOf("vb", "j")})"))
    time("join+guard")(guarded.queryExecution.toRdd.count())
    val full = guarded.select(col("doc_a"), col("doc_b"),
      expr("CAST(bit_count(va ^ vb) AS BIGINT)").as("hamming"))
      .where(col("hamming") <= 3)
    time("join+guard+ham")(full.queryExecution.toRdd.count())
    time("plus orderBy")(full.orderBy("doc_a", "doc_b").queryExecution.toRdd.count())
    spark.stop()
  }
}
