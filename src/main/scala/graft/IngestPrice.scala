package graft

import org.apache.spark.sql.functions._

/** Prices the round-17 ingest-MAINTAINED vector store (round-16
  * verdict items 1-2) with measurements on a 100× embeddings corpus:
  * what the segmented `vec3-` layout buys is that absorbing an ingest
  * increment costs ONE pass over the ARRIVALS (assign + cell-
  * partitioned segment write, [[graft.ops.NearDup.writeIngestSegment]])
  * instead of the full-corpus index rewrite it replaces
  * ([[graft.ops.NearDup.writeIvfIndexStore]] — measured 36.7 s at
  * 200k vectors in round 16), and that the flag-consumed generation-2
  * rebuild is a SCHEDULED cost paid only when drift crosses the
  * threshold. Also measures the retrieval consequence at scale: a
  * drifted-region probe's recall@5 against the exact full-corpus
  * truth, served by generation 1 (ingest applied, no retrain) vs
  * generation 2 (rebuilt). Prints one JSON line (the StreamScale
  * convention). Run:
  *
  *   python3 - <<'P'
  *   import sys; sys.path.insert(0, '/root/repo/scripts')
  *   import gen_scale, os; os.makedirs('/tmp/graft_emb100', exist_ok=True)
  *   gen_scale.gen_embeddings('/root/testdata/sf0.1', '/tmp/graft_emb100', 100)
  *   P
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_emb100 sbt "runMain graft.IngestPrice"
  */
object IngestPrice {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/tmp/graft_emb100")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .appName("graft-ingest-price")
      .config(graft.ops.NearDup.VecStoreDirConf,
        sys.env.getOrElse("SPARK_GRAFT_VEC_STORE", "/tmp/graft-vecstore-ingest-price"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.NearDup

    // Fresh store with the VecPrice guard: only a directory holding
    // nothing but vec-store artifacts is deletable.
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) Option(p.listFiles()).getOrElse(Array.empty).foreach(rm)
      p.delete(); ()
    }
    val storeRoot = new java.io.File(spark.conf.get(NearDup.VecStoreDirConf))
    val foreign = Option(storeRoot.listFiles()).getOrElse(Array.empty[java.io.File])
      .filterNot(f => f.getName.matches("vec\\d+-[0-9a-f]{16}") ||
        f.getName.startsWith(".tmp-"))
    require(foreign.isEmpty,
      s"IngestPrice: refusing to delete $storeRoot — non-store entries: " +
        foreign.take(5).map(_.getName).mkString(", "))
    rm(storeRoot)

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val emb = Tables.t(spark, sfDir, "embeddings")
    val n = emb.count()
    val nNew = emb.where(NearDup.ingestIsNew).count()
    // The ingest path: base generation (one-time), then the increment
    // APPEND, then the flag-consumed rebuild.
    val (_, baseSec) = time(NearDup.writeIngestBaseStore(spark, sfDir))
    val (_, appendSec) = time(NearDup.writeIngestSegment(spark, sfDir))
    val (_, rebuildSec) = time(NearDup.writeRebuiltIndexStore(spark, sfDir))
    // The comparator it replaces: the vec2 full-corpus index build
    // (refined centroids + full cluster-partitioned rewrite).
    val (_, fullCentSec) = time(NearDup.writeCentroidStore(spark, sfDir))
    val (_, fullRewriteSec) = time(NearDup.writeIvfIndexStore(spark, sfDir))
    // Retrieval consequence at scale: drifted-region probe, exact
    // full-corpus top-5 truth, gen1 vs gen2.
    val probeId = emb.where(NearDup.ingestIsNew)
      .agg(min("vec_id")).head.getLong(0)
    val probeVec = emb.where(col("vec_id") === probeId)
      .select(col("vec_id"), col("embedding"))
    val pv = emb.where(col("vec_id") === probeId)
      .select(col("embedding").as("probe"))
    val dot = graft.functions.ArrayDot.adot _
    val bf = emb.crossJoin(broadcast(pv))
      .select(col("vec_id"),
        round(dot(col("embedding"), col("probe")) /
          (sqrt(dot(col("embedding"), col("embedding"))) *
            sqrt(dot(col("probe"), col("probe")))), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    def probeGen(gen: Int): (Int, Double) = {
      val (ids, sec) = time(NearDup.ingestProbe(spark, sfDir, probeVec, gen)
        .select("vec_id").collect().map(_.getLong(0)).toSet)
      ((ids & bf).size, sec)
    }
    val (g1Hits, g1Sec) = probeGen(1)
    val (g2Hits, g2Sec) = probeGen(2)
    val flagged = NearDup.ingestSegStore(spark, sfDir)
      .groupBy(col("cluster"))
      .agg(sum(when(col("segment") === 0, 1L).otherwise(0L)).as("n_base"),
        sum(when(col("segment") === 1, 1L).otherwise(0L)).as("n_new"))
      .where(col("n_new") * NearDup.IngestRetrainDen > col("n_base")).count()
    println(s"""{"probe":"ingest_index_price","vectors":$n,"arrivals":$nNew,""" +
      s""""base_build_sec":$baseSec,"ingest_append_sec":$appendSec,""" +
      s""""rebuild_swap_sec":$rebuildSec,""" +
      s""""full_centroid_sec":$fullCentSec,"full_rewrite_sec":$fullRewriteSec,""" +
      s""""flagged_cells":$flagged,""" +
      s""""probe_vec_id":$probeId,"recall5_gen1":${g1Hits / 5.0},""" +
      s""""recall5_gen2":${g2Hits / 5.0},""" +
      s""""probe_gen1_sec":$g1Sec,"probe_gen2_sec":$g2Sec}""")
    spark.stop()
  }
}
