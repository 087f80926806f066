package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustered layouts: multi-dimensional data locality
  * for scans that filter on MORE than the partition key.
  *
  * Directory partitioning prunes one dimension; a second selective
  * predicate (price band × user range, time box × symbol set) still reads
  * every surviving file. Interleaving the bits of the filter dimensions
  * into one sort key makes each output file cover a small RECTANGLE of
  * the filter space instead of a thin slice of one dimension — so a box
  * query's rows concentrate in a few files, and any min/max-stats reader
  * (parquet footers, lakehouse file skipping) drops the rest without
  * reading them.
  *
  * All of it is plain relational Spark: per-dimension equi-width bucket
  * ids (the histogram's broadcast-min/max + codegen bin map), a bit
  * interleave folded from shift/AND/OR expressions (whole-stage codegen —
  * no UDF), and `repartitionByRange` on the z-value for the clustered
  * write. At 100 TB the only data movement is the one range shuffle the
  * write pays anyway; the z-column itself is dropped before hitting disk.
  */
object Layout {

  /** Bit-interleave of pre-bucketed dimensions (each in [0, 2^bits)):
    * dimension d contributes its bit i at output position i*n + d.
    * Folded into one codegen'd expression tree of shifts and ORs.
    */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.length
    require(bits * n <= 63,
      s"bits * dims = ${bits * n} exceeds 63: high bits would shift past " +
        "the long width and silently destroy z-order locality")
    val terms = for {
      i <- 0 until bits
      (b, d) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + d)
    terms.foldLeft(lit(0L))((acc, t) => acc.bitwiseOR(t))
  }

  /** Equi-width bucket id in [0, 2^bits) over the column's actual range
    * (same expression family as `Stats.histogram`; degenerate min==max
    * collapses to bucket 0).
    */
  private def bucketize(v: Column, mn: Column, mx: Column, bits: Int): Column = {
    val nb = 1L << bits
    when(mx === mn, lit(0L))
      .otherwise(least(
        floor((v.cast("double") - mn) / ((mx - mn) / nb)), lit(nb - 1)))
  }

  /** Write `df` clustered by the z-order of `dims` into `nFiles` range
    * partitions (one file each). Returns nothing; the layout is the
    * artifact. Dimension ranges come from one 1-row min/max aggregate
    * broadcast over the data — at lake scale substitute catalog stats.
    */
  def writeZOrdered(df: DataFrame, dims: Seq[String], bits: Int,
                    nFiles: Int, dir: String): Unit = {
    val aggs = dims.flatMap(d => Seq(
      min(col(d).cast("double")).as(s"_mn_$d"),
      max(col(d).cast("double")).as(s"_mx_$d")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val buckets = dims.map(d =>
      bucketize(col(d), col(s"_mn_$d"), col(s"_mx_$d"), bits))
    df.crossJoin(broadcast(bounds))
      .withColumn("_z", interleave(buckets, bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop((dims.map(d => s"_mn_$d") ++ dims.map(d => s"_mx_$d") :+ "_z"): _*)
      .write.mode("overwrite").parquet(dir)
  }

  /** Small-file compaction — the lake-maintenance pass every streaming
    * or per-batch sink eventually owes: micro-batch appends and
    * per-partition MERGEs leave directories of KB-scale files, and at
    * 100 TB readers pay a task launch + footer read PER FILE, so scan
    * cost detaches from data size. Rewrites `dir` into
    * ceil(totalBytes / targetFileBytes) files (one round-robin
    * repartition — the shuffle is the price of admission and is
    * proportional to the data compacted, not the table), staged in a
    * sibling directory and swapped live via two renames. Same
    * plain-parquet contract as the streaming warehouse sink: the swap is
    * convergent but not transactional — a reader racing the two renames
    * can see the directory missing; pair with a table format for
    * concurrent-reader isolation.
    *
    * Returns (files before, files after).
    */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val live = new Path(dir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(live)
    val dataFiles = entries
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    // a partitioned root has key=value subdirs and no data files of its
    // own — flat-compacting it would rewrite the table WITHOUT its
    // directory layout (partition values demoted to a data column)
    require(dataFiles.nonEmpty ||
      !entries.exists(e => e.isDirectory && e.getPath.getName.contains("=")),
      s"$dir is a partitioned root — use compactPartitioned, which keeps " +
        "the key=value directory layout")
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut =
      math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val staged = new Path(dir + "_graft_compact_staged")
    val retired = new Path(dir + "_graft_compact_retired")
    fs.delete(staged, true)
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(staged.toString)
    fs.delete(retired, true)
    fs.rename(live, retired)
    fs.rename(staged, live)
    fs.delete(retired, true)
    (dataFiles.length, nOut)
  }

  /** [[compact]] over a Hive-partitioned layout: each `key=value`
    * sub-directory compacts independently (bounded by the partition's
    * own bytes — the same per-partition maintenance unit lakehouse
    * OPTIMIZE jobs use), so a huge table compacts incrementally and a
    * failure affects one partition, not the table. Files inside a
    * partition directory don't store the partition column, so the
    * in-place rewrite preserves read-back schema exactly.
    *
    * Returns partition → (files before, files after).
    */
  def compactPartitioned(spark: SparkSession, root: String,
                         targetFileBytes: Long): Map[String, (Int, Int)] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(rootPath)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map { s =>
        s.getPath.getName ->
          compact(spark, s.getPath.toString, targetFileBytes)
      }.toMap
  }
}
