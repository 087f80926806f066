package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway: ann_ivf recall vs (nlist, nprobe, iters), ann_pq recall vs
// candidates, at sf0.1. Delete before commit.
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val sfDir = "/root/testdata/sf0.1"
    val emb = io.Tables.embeddings(spark, sfDir).cache()
    val exact = ops.Similarity.cosineTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head().getAs[scala.collection.Seq[Float]](0).toArray
    for (nlist <- Seq(8, 16, 32); nprobe <- Seq(2, 4, 8); iters <- Seq(3)) {
      val dir = java.nio.file.Files.createTempDirectory("ivf_t").toString + "/l"
      val cents = ops.Ivf.writeIvfLayout(emb, dir, nlist = nlist, iters = iters)
      val got = ops.Ivf.ivfProbe(spark, dir, cents, q, 10, nprobe = nprobe,
        excludeId = Some(0L)).collect().map(_.getLong(0)).toSet
      println(s"IVF nlist=$nlist nprobe=$nprobe iters=$iters recall=${got.intersect(exact).size / 10.0}")
    }
    for (cand <- Seq(40, 100, 200)) {
      val got = ops.Ivf.annPq(emb, 0L, 10, candidates = cand)
        .collect().map(_.getLong(0)).toSet
      println(s"PQ candidates=$cand recall=${got.intersect(exact).size / 10.0}")
    }
    for (cand <- Seq(40, 100, 200); nprobe <- Seq(2, 4)) {
      val got = ops.Ivf.annIvfPq(emb, 0L, 10, nprobe = nprobe, candidates = cand)
        .collect().map(_.getLong(0)).toSet
      println(s"IVFPQ nprobe=$nprobe candidates=$cand recall=${got.intersect(exact).size / 10.0}")
    }
    spark.stop()
  }
}
