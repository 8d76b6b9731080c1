package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Record-linkage scale rehearsal (round-14 verdict items 1 + 6):
  * drive the c159/c160/c161 Fellegi-Sunter family against a 100×
  * TPC-H corpus (1.5M customers at `gen_scale.py --tpch` over sf0.1)
  * and MEASURE the scale claims the sf0.1 gate can only argue:
  *
  *   1. Blocking linearity — per-pass candidate counts. The question
  *      at 1.5M customers: does the (nation, segment, balance-cents)
  *      block stay linear when 1.5M balances hash into ~1.1M distinct
  *      cent values, i.e. do stranger collisions stay O(n)?
  *   2. Kernel economy — EditDistance evaluations = candidates after
  *      the row-local pass disjointness, never n².
  *   3. Planted recall, counted independently of the pipeline under
  *      test (the c158 standard): every md5-dealt dirty record must
  *      self-link at its class's exact score (9 / 6), tallied by a
  *      direct join of the output against the plant derivation — not
  *      by trusting the pipeline's own bookkeeping.
  *   4. c161 completeness at scale: exactly one decision per dirty
  *      record, and the self-resolution rate.
  *   5. c160 stream/batch equality at 100× under a MULTI-BATCH file
  *      feed (maxFilesPerTrigger=1 over a sliced dirty source — a
  *      live reconciliation runs micro-batch by micro-batch, not as
  *      one AvailableNow gulp): per-batch emission counts must sum to
  *      the batch answer, no pair may emit twice across batches, and
  *      the emission union must equal batch c159 exactly.
  *
  * Prints one JSON line per probe (the StreamScale convention); the
  * cross-engine 100× hash check runs separately via
  * `scripts/link_oracle.py` (16-way dirty-sharded DuckDB replay of
  * the c159 oracle) against the batch parquet this main writes.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_tpch100 sbt "runMain graft.LinkScale"
  */
object LinkScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/tmp/graft_tpch100")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_LINK_OUT", "/tmp/graft_link100")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .appName("graft-link-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Llm

    // Task metrics listener (the Bench discipline): spill and task
    // counts are measured, not argued.
    val spillBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val taskCount = new java.util.concurrent.atomic.AtomicLong(0L)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        taskCount.incrementAndGet()
        if (m != null) {
          cpuNs.addAndGet(m.executorCpuTime)
          spillBytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          ()
        }
      }
    })
    def counters(): (Long, Long, Long) =
      (cpuNs.get(), spillBytes.get(), taskCount.get())

    val cust = Tables.t(spark, sfDir, "customer")
    val nCust = cust.count()
    val clean = Llm.linkClean(cust)
    val dirty = Llm.linkDirty(cust)
    // Class split of the plant (drives the per-pass expectations).
    val clsCounts = dirty
      .join(cust.select(col("c_custkey").as("dirty_id"),
        when(substring(md5(concat(lit("link:"), col("c_custkey").cast("string"))), 2, 1) < "8", 0)
          .otherwise(1).as("cls")), "dirty_id")
      .groupBy("cls").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nDirty = clsCounts.values.sum
    println(s"""{"probe":"corpus","sf_dir":"$sfDir","customers":$nCust,""" +
      s""""dirty":$nDirty,"cls0_name_corrupt":${clsCounts.getOrElse(0, 0L)},""" +
      s""""cls1_bal_corrupt":${clsCounts.getOrElse(1, 0L)}}""")

    // 1+2 — candidate counts per blocking pass (pre-kernel): linearity
    // is candidates/dirty staying O(1). passB counts AFTER the
    // row-local disjointness filter, because that is what the kernel
    // actually scores.
    val passA = dirty.join(clean,
      col("nat") === col("nat_d") && col("seg") === col("seg_d") &&
        col("bal_cents") === col("bal_cents_d")).count()
    val passB = dirty.join(clean,
      col("nat") === col("nat_d") && col("seg") === col("seg_d") &&
        col("name") === col("name_d"))
      .where(col("bal_cents") =!= col("bal_cents_d")).count()
    val kernelEvals = passA + passB
    println(s"""{"probe":"blocking","pass_a_candidates":$passA,""" +
      s""""pass_b_candidates_after_disjoint":$passB,""" +
      s""""kernel_evals":$kernelEvals,""" +
      s""""candidates_per_dirty":${"%.4f".format(kernelEvals.toDouble / nDirty)}}""")

    // 3 — batch c159, timed min-of-2 (full plan evaluation), then the
    // result persisted once for the independent checks + the DuckDB
    // sharded oracle.
    def timeOnce(f: => Unit): (Double, Double, Long, Long) = {
      val (c0, s0, k0) = counters()
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener drain
      val (c1, s1, k1) = counters()
      (wall, (c1 - c0) / 1e9, s1 - s0, k1 - k0)
    }
    val runs = (1 to 2).map(_ => timeOnce {
      Llm.recordLinkage(spark, sfDir).queryExecution.toRdd.count(); ()
    })
    val best = runs.minBy(_._1)
    println(s"""{"probe":"c159_batch","wall_sec":${best._1},""" +
      s""""cpu_sec":${best._2},"spilled_bytes":${best._3},"tasks":${best._4},""" +
      s""""runs":[${runs.map(_._1).mkString(",")}]}""")

    val batchOut = s"$outDir/batch_c159.parquet"
    val pairs = Llm.recordLinkage(spark, sfDir)
    pairs.write.mode("overwrite").parquet(batchOut)
    val saved = spark.read.parquet(batchOut)
    val nPairs = saved.count()
    // Planted recall, counted INDEPENDENTLY: re-derive each dirty
    // record's class (hence its expected self-link score) straight
    // from the md5 plant definition and join the OUTPUT against it.
    val expected = cust
      .where(substring(md5(concat(lit("link:"), col("c_custkey").cast("string"))), 1, 1) < "8")
      .select(col("c_custkey").as("dirty_id"),
        when(substring(md5(concat(lit("link:"), col("c_custkey").cast("string"))), 2, 1) < "8", 9)
          .otherwise(6).as("expected_score"))
    val recovered = expected.join(
      saved.where(col("cust_id") === col("dirty_id"))
        .select(col("dirty_id"), col("score")), "dirty_id")
      .where(col("score") === col("expected_score")).count()
    println(s"""{"probe":"c159_recall","pairs_total":$nPairs,""" +
      s""""planted":$nDirty,"recovered_at_exact_score":$recovered}""")
    require(recovered == nDirty,
      s"planted-pair recall loss at 100x: $recovered of $nDirty")

    // 4 — c161 resolution completeness at scale.
    val dec = Llm.linkageResolution(spark, sfDir)
      .groupBy("decision").agg(count(lit(1)).as("n"),
        sum(when(col("matched_id") === col("dirty_id"), 1L).otherwise(0L)).as("self"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nLinked = dec.get("linked").map(_._1).getOrElse(0L)
    val nUnmatched = dec.get("unmatched").map(_._1).getOrElse(0L)
    val nSelf = dec.get("linked").map(_._2).getOrElse(0L)
    println(s"""{"probe":"c161_resolution","decisions":${nLinked + nUnmatched},""" +
      s""""linked":$nLinked,"unmatched":$nUnmatched,"self_resolved":$nSelf}""")
    require(nLinked + nUnmatched == nDirty,
      s"c161 must emit exactly one decision per dirty record: ${nLinked + nUnmatched} != $nDirty")

    // 5 — c160 as a LIVE multi-batch stream: dirty source sliced into
    // 8 files, one file per micro-batch (a reconciliation ingesting
    // day by day), emissions logged with their batch id.
    val feedDir = s"$outDir/customer_feed.parquet"
    cust.repartition(8).write.mode("overwrite").parquet(feedDir)
    val streamOut = s"$outDir/stream_c160.parquet"
    val ckpt = s"$outDir/stream_ckpt"
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) Option(p.listFiles()).getOrElse(Array.empty).foreach(rm)
      p.delete(); ()
    }
    Seq(streamOut, ckpt).foreach(d => rm(new java.io.File(d)))
    val streamCust = spark.readStream.schema(cust.schema)
      .option("maxFilesPerTrigger", "1").parquet(feedDir)
    val linked = Llm.linkPairs(clean, Llm.linkDirty(streamCust))
    val t0 = System.nanoTime()
    // Idempotent per-batch writes (the c162 discipline): overwrite a
    // deterministic batch_id=<id> directory so a foreachBatch replay
    // after a crash cannot double-write.
    val q = linked.writeStream.outputMode("append")
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        batch.write.mode("overwrite").parquet(s"$streamOut/batch_id=$id"))
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamWall = (System.nanoTime() - t0) / 1e9
    val emitted = spark.read.parquet(streamOut)
    val perBatch = emitted.groupBy(col("batch_id").cast("long").as("batch_id")).count()
      .orderBy("batch_id").collect().map(r => r.getLong(0) -> r.getLong(1))
    val nBatches = perBatch.length
    val nEmitted = perBatch.map(_._2).sum
    val nDistinct = emitted.select("cust_id", "dirty_id").distinct().count()
    val streamPairs = emitted.drop("batch_id")
    val diff = streamPairs.exceptAll(saved).count() + saved.exceptAll(streamPairs).count()
    println(s"""{"probe":"c160_multibatch","wall_sec":$streamWall,""" +
      s""""batches":$nBatches,""" +
      s""""per_batch":[${perBatch.map(_._2).mkString(",")}],""" +
      s""""emissions":$nEmitted,"distinct_pairs":$nDistinct,""" +
      s""""batch_pairs":$nPairs,"diff_vs_batch":$diff}""")
    require(nBatches >= 3, s"multi-batch feed must run >=3 micro-batches, got $nBatches")
    require(nEmitted == nPairs && nDistinct == nEmitted,
      s"stream emissions must sum to the batch answer with no pair twice: " +
        s"emitted=$nEmitted distinct=$nDistinct batch=$nPairs")
    require(diff == 0L, s"c160 stream/batch divergence at 100x: $diff rows")

    // 6 — c162 (streaming RESOLUTION) over the same multi-batch feed:
    // each micro-batch's dirty slice resolves batch-locally through
    // the shared kernel; the emission union must be batch c161
    // verbatim with exactly one decision per dirty record.
    val resOut = s"$outDir/stream_c162.parquet"
    val resCkpt = s"$outDir/stream_c162_ckpt"
    Seq(resOut, resCkpt).foreach(d => rm(new java.io.File(d)))
    val streamCust2 = spark.readStream.schema(cust.schema)
      .option("maxFilesPerTrigger", "1").parquet(feedDir)
    val t1 = System.nanoTime()
    val q2 = streamCust2.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        Llm.resolveFrom(clean, Llm.linkDirty(batch))
          .write.mode("overwrite").parquet(s"$resOut/batch_id=$id"))
      .option("checkpointLocation", resCkpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val resWall = (System.nanoTime() - t1) / 1e9
    val resEmitted = spark.read.parquet(resOut)
    val resBatches = resEmitted.select("batch_id").distinct().count()
    val nDecisions = resEmitted.count()
    val nUniqueDirty = resEmitted.select("dirty_id").distinct().count()
    val batchRes = Llm.resolveFrom(clean, dirty)
    val resDiff = resEmitted.drop("batch_id").exceptAll(batchRes).count() +
      batchRes.exceptAll(resEmitted.drop("batch_id")).count()
    println(s"""{"probe":"c162_multibatch","wall_sec":$resWall,""" +
      s""""batches":$resBatches,"decisions":$nDecisions,""" +
      s""""unique_dirty":$nUniqueDirty,"diff_vs_batch":$resDiff}""")
    require(resBatches >= 3 && nDecisions == nDirty && nUniqueDirty == nDirty,
      s"c162 must decide exactly once per dirty record across >=3 batches: " +
        s"batches=$resBatches decisions=$nDecisions unique=$nUniqueDirty dirty=$nDirty")
    require(resDiff == 0L, s"c162 stream/batch divergence at 100x: $resDiff rows")

    // 7 — c171 (round 16): estimated-weight rescore at 100×. The
    // band-migration matrix IS the "how many decisions flip" answer;
    // the non-demotion invariant is re-proved at scale by direct
    // count, not by trusting the sf-gate spec.
    val r171 = (1 to 2).map(_ => timeOnce {
      Llm.fsEstimatedRescore(spark, sfDir).queryExecution.toRdd.count(); ()
    })
    val b171 = r171.minBy(_._1)
    val matrix = Llm.fsEstimatedRescore(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val totalCands = matrix.map(_._3).sum
    val flipped = matrix.filter(m => m._1 != m._2).map(_._3).sum
    val cells = matrix.map(m =>
      s"""{"assumed":"${m._1}","est":"${m._2}","n":${m._3}}""").mkString(",")
    val demoted = Llm.estRescoredOf(clean, dirty)
      .where(col("cust_id") === col("dirty_id") &&
        !col("band_est").isin("link", "review")).count()
    println(s"""{"probe":"c171_rescore","wall_sec":${b171._1},""" +
      s""""cpu_sec":${b171._2},"spilled_bytes":${b171._3},"tasks":${b171._4},""" +
      s""""candidates":$totalCands,"decisions_flipped":$flipped,""" +
      s""""w_name_est":${matrix.head._4},"w_bal_est":${matrix.head._5},""" +
      s""""planted_demoted":$demoted,"matrix":[$cells]}""")
    require(demoted == 0L, s"c171 planted pairs demoted at 100x: $demoted")
    spark.stop()
  }
}
