package graft
// throwaway diagnostic main (r18-opt): decompose dedup_clusters_lsh at a
// given SF into artifact build / pair mining / CC closure walls. Deleted
// after the measurement it exists for.
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1shape")
    val spark = GraftSession.localBuilder(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = io.Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("probe_minhash_").toString + "/h"
    t("artifact build (tokenize+repartition+write)") {
      ops.Similarity.shingleHashes(docs)
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(dir)
    }
    val pairs = ops.Similarity.minhashNearDupFromArtifact(spark, dir)
    val pairsCut = t("mining (bands+verify) to cut") { ops.Checkpoints.stable(pairs) }
    t("CC closure + verdict") {
      ops.Clustering.dedupClusters(pairsCut)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
