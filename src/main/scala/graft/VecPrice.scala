package graft

/** Prices the round-16 vector-index store (round-15 verdict item 2)
  * with a measurement: the c38 refined-centroid artifact and the
  * c56/c57 PQ sub-codebook now persist per corpus
  * ([[graft.ops.NearDup.centroidStore]] /
  * [[graft.ops.NearDup.pqCodebookStore]] — the band-store
  * discipline), so the train pass runs once and every later probe
  * job reads the index from disk. This main measures, on a 100×
  * embeddings corpus, the one-time build cost vs the per-probe cost
  * it amortizes: cold build (assign+update over the corpus), the PQ
  * seed slice, then two warm c38 probes that read the store.
  * Prints one JSON line (the StreamScale convention). Run:
  *
  *   python3 - <<'P'
  *   import sys; sys.path.insert(0, '/root/repo/scripts')
  *   import gen_scale, os; os.makedirs('/tmp/graft_emb100', exist_ok=True)
  *   gen_scale.gen_embeddings('/root/testdata/sf0.1', '/tmp/graft_emb100', 100)
  *   P
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_emb100 sbt "runMain graft.VecPrice"
  */
object VecPrice {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/tmp/graft_emb100")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .appName("graft-vec-price")
      .config(graft.ops.NearDup.VecStoreDirConf,
        sys.env.getOrElse("SPARK_GRAFT_VEC_STORE", "/tmp/graft-vecstore-price"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.NearDup

    // Fresh store: a price run measures the COLD build. GUARD before
    // the recursive delete (round-16 advice: an env var pointing this
    // at the shared default store — or any unrelated directory —
    // destroyed it): only a directory that is absent or holds nothing
    // but vec-store artifacts (`vec<N>-<hash>` entries and `.tmp-`
    // scratch) is deletable; anything else aborts loudly.
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) Option(p.listFiles()).getOrElse(Array.empty).foreach(rm)
      p.delete(); ()
    }
    val storeRoot = new java.io.File(spark.conf.get(NearDup.VecStoreDirConf))
    val foreign = Option(storeRoot.listFiles()).getOrElse(Array.empty[java.io.File])
      .filterNot(f => f.getName.matches("vec\\d+-[0-9a-f]{16}") ||
        f.getName.startsWith(".tmp-"))
    require(foreign.isEmpty,
      s"VecPrice: refusing to delete $storeRoot — it contains entries that " +
        s"are not vec-store artifacts: ${foreign.take(5).map(_.getName).mkString(", ")}")
    rm(storeRoot)

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val n = Tables.t(spark, sfDir, "embeddings").count()
    val (dir, buildSec) = time(NearDup.writeCentroidStore(spark, sfDir))
    val (_, pqSec) = time(NearDup.writePqCodebookStore(spark, sfDir))
    val (_, ivfSec) = time(NearDup.writeIvfIndexStore(spark, sfDir))
    val (_, codesSec) = time(NearDup.writePqCodesStore(spark, sfDir))
    val (r1, probe1) = time(NearDup.annIvfAdaptive(spark, sfDir).collect())
    val (_, probe2) = time(NearDup.annIvfAdaptive(spark, sfDir).collect())
    val (_, ivfadc) = time(NearDup.ivfPqSearch(spark, sfDir).collect())
    val (_, filtered) = time(NearDup.filteredAnn(spark, sfDir).collect())
    val centRows = spark.read.parquet(s"$dir/centroids.parquet").count()
    def du(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(du).sum
      else f.length
    val metaBytes = du(new java.io.File(s"$dir/centroids.parquet")) +
      du(new java.io.File(s"$dir/pq_codebook.parquet"))
    val ivfBytes = du(new java.io.File(s"$dir/ivf.parquet"))
    println(s"""{"probe":"vec_index_price","vectors":$n,""" +
      s""""centroids":$centRows,"meta_store_bytes":$metaBytes,""" +
      s""""ivf_store_bytes":$ivfBytes,""" +
      s""""centroid_build_sec":$buildSec,"pq_codebook_sec":$pqSec,""" +
      s""""ivf_build_sec":$ivfSec,"pq_codes_build_sec":$codesSec,""" +
      s""""c38_probe1_sec":$probe1,"c38_probe2_sec":$probe2,""" +
      s""""c173_ivfadc_sec":$ivfadc,"c174_filtered_sec":$filtered,""" +
      s""""topk_rows":${r1.length}}""")
    spark.stop()
  }
}
