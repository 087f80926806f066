package graft.stream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.{col, date_format, timestamp_seconds}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The streaming warehouse sink (SURVEY §2.8 terminal step): carry the
  * reference's CREATE-OR-REPLACE warehouse semantics
  * (`components/duckdb_api.py:44-47`) and its append-double-count fix
  * (`components/process_data.py:125` appends blindly — a re-run lands
  * every row twice) into the continuous-ingest path.
  *
  * Shape: `foreachBatch` + keyed month-partition MERGE over plain
  * parquet. Structured Streaming's contract is that a micro-batch may be
  * REPLAYED after a failure (same batch id, same rows), so the batch
  * writer must be idempotent — blind append is exactly wrong. Each batch:
  *
  *  1. months touched by the batch are computed (a handful of values);
  *  2. ONLY those month partitions are read back from the warehouse
  *     (partition pruning keeps this bounded by the batch's time span, not
  *     the table's history — at 100 TB the table is years wide but a
  *     batch touches one or two months);
  *  3. existing rows whose key re-arrives are dropped (left-anti on the
  *     batch's keys — new version wins), the rest union with the batch;
  *  4. dynamic partition overwrite replaces just the affected months.
  *
  * Replaying any batch — or replaying the WHOLE stream from a deleted
  * checkpoint — converges to the same table: upsert, not append. This is
  * MERGE INTO re-expressed over plain parquet; on a Delta/Iceberg lake
  * the same `foreachBatch` body becomes the native MERGE call.
  *
  * Crash-window contract (write-audit-publish): the merged months are
  * STAGED into a hidden `_graft_staging_*` directory under the table
  * root, row-count audited, and only then PUBLISHED by per-month
  * directory renames. Readers therefore never observe a half-rewritten
  * month: each `month=M` directory is either entirely the old version or
  * entirely the new one (rename is atomic per directory on HDFS-like
  * filesystems; hidden `_`-prefixed siblings are invisible to partition
  * discovery). What plain parquet canNOT give is cross-month atomicity —
  * a crash between two month renames leaves month A new and month B old
  * until the replay. The replay's recovery sweep makes even that safe:
  * a month caught between retire and publish is restored from its
  * retired copy (never deleted), so no committed row is ever lost; then
  * the re-merge converges the table. On a Delta/Iceberg lake the same
  * body becomes a single atomic MERGE commit.
  *
  * The `localCheckpoint(eager)` calls pin the batch/existing rows so both
  * the staged write and the audit read them once, and keep the lineage
  * clear of the directory being republished. The materialized volume is
  * bounded by the affected partitions, not the table.
  */
object StreamingSink {

  /** One idempotent MERGE of `batch` into the month-partitioned parquet
    * warehouse at `path`. Rows are keyed by `keyCol` (latest write wins);
    * `tsCol` derives the `month` partition value. Usable directly as a
    * batch upsert too — the streaming sink is this, once per micro-batch.
    */
  def upsertByMonth(batch: DataFrame, keyCol: String, tsCol: String,
                    path: String): Unit =
    upsertByMonth(batch, Seq(keyCol), tsCol, path)

  /** Composite-key form: aggregated tables are keyed by their full group
    * key — e.g. the hourly-bar warehouse upserts on (bucket, event_type),
    * so a bar RE-emitted with more data (update-mode streaming aggregate,
    * or a late-data recompute) replaces its previous version instead of
    * duplicating it.
    */
  def upsertByMonth(batch: DataFrame, keyCols: Seq[String], tsCol: String,
                    path: String): Unit = {
    require(keyCols.nonEmpty)
    val spark = batch.sparkSession
    val b = batch
      .withColumn("month", date_format(col(tsCol), "yyyy-MM"))
      .dropDuplicates(keyCols) // a replayed batch may also self-duplicate
      .localCheckpoint(true)
    val months = b.select("month").distinct().collect().map(_.getString(0))
    if (months.isEmpty) return
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    sweepOrphans(fs, root) // a prior crash's staging/retired leftovers
    val merged =
      if (!fs.exists(root)) b
      else {
        val survivors = spark.read.parquet(path)
          .filter(col("month").isin(months.toSeq: _*)) // partition-pruned
          .join(b.select(keyCols.map(col): _*), keyCols, "left_anti")
          .localCheckpoint(true)
        b.unionByName(survivors)
      }
    // WRITE: stage the merged months under a hidden sibling (same
    // filesystem, so the publish renames are metadata-only and atomic).
    val token = java.util.UUID.randomUUID().toString.take(8)
    val stage = new Path(root, s"_graft_staging_$token")
    merged.write.mode("overwrite").partitionBy("month").parquet(stage.toString)
    // AUDIT: the staged copy must hold exactly the merged row count —
    // a partial/failed stage write never reaches publish.
    val stagedCount = spark.read.parquet(stage.toString).count()
    val expected = merged.count()
    if (stagedCount != expected) {
      fs.delete(stage, true)
      throw new IllegalStateException(
        s"staged write audit failed: $stagedCount staged vs $expected merged rows")
    }
    // PUBLISH: per-month atomic swap — retire the live directory to a
    // hidden name, rename the staged one into place, then sweep. A crash
    // here leaves whole months old or new (never mixed); the next merge's
    // sweep restores any month stranded between retire and publish from
    // its retired copy before deleting anything.
    months.foreach { m =>
      val live = new Path(root, s"month=$m")
      val staged = new Path(stage, s"month=$m")
      if (fs.exists(live)) {
        fs.rename(live, new Path(root, s"_graft_retired_${token}_month_$m"))
      }
      publishFault.foreach(f => f(m)) // test-only crash point (see below)
      if (fs.exists(staged)) fs.rename(staged, live)
    }
    sweepOrphans(fs, root)
  }

  /** Fault-injection seam for the crash-window specs: invoked between
    * RETIRE and PUBLISH of each month — the worst possible instant (the
    * live directory is gone, the staged one not yet renamed). Throwing
    * from it aborts the merge exactly there; production never sets it.
    */
  private[graft] var publishFault: Option[String => Unit] = None

  /** Recover a warehouse from a crashed or interrupted publish WITHOUT
    * merging new data: restore any month stranded in its retired copy,
    * sweep staging leftovers. The next merge does this implicitly; this
    * entry point is for bringing a table back to a consistent state
    * immediately after a hard stop.
    */
  def recover(spark: SparkSession, path: String): Unit = {
    val root = new Path(path)
    sweepOrphans(root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  /** Recover from a crashed publish, then clear hidden leftovers
    * (invisible to readers — partition discovery skips `_`-prefixed
    * names). A retired month whose live `month=M` directory is MISSING
    * means the crash hit between retire and publish: the retired copy is
    * the only full version of that month, so it is RESTORED (renamed
    * back), never deleted. Every other leftover — retired months whose
    * publish completed, staging dirs of any generation — is swept.
    * Idempotent; runs before every merge reads the table.
    */
  private def sweepOrphans(fs: org.apache.hadoop.fs.FileSystem, root: Path): Unit =
    if (fs.exists(root)) {
      val entries = fs.listStatus(root).map(_.getPath)
      entries.filter(_.getName.startsWith("_graft_retired_")).foreach { p =>
        val month = p.getName.split("_month_", 2).last
        val live = new Path(root, s"month=$month")
        if (!fs.exists(live)) fs.rename(p, live) else fs.delete(p, true)
      }
      entries.filter(_.getName.startsWith("_graft_staging_"))
        .foreach(fs.delete(_, true))
    }

  /** The streaming warehouse sink: every micro-batch MERGEs into the
    * month-partitioned warehouse via [[upsertByMonth]]. `AvailableNow`
    * drains the backlog and stops (the reference's monthly batch cadence
    * run through the streaming engine); pass `availableNow = false` for a
    * continuously running query.
    */
  def warehouseSink(stream: DataFrame, keyCol: String, tsCol: String,
                    outPath: String, checkpoint: String,
                    availableNow: Boolean = true,
                    processingTime: Option[String] = None): StreamingQuery = {
    val w = stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        upsertByMonth(batch.toDF(), keyCol, tsCol, outPath)
      }
      .option("checkpointLocation", checkpoint)
    w.trigger(pickTrigger(availableNow, processingTime)).start()
  }

  /** `processingTime` (e.g. "500 milliseconds") paces a CONTINUOUSLY
    * running query's micro-batches and overrides `availableNow`; with
    * neither, a non-availableNow query runs back-to-back batches.
    */
  private def pickTrigger(availableNow: Boolean,
                          processingTime: Option[String]): Trigger =
    processingTime.map(Trigger.ProcessingTime(_)).getOrElse(
      if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(0L))

  /** The reference's ACTUAL terminal table, end-to-end: the streaming
    * hourly-OHLC aggregate ([[StreamingResample.hourlyOhlc]]-shaped,
    * `bucket` = epoch-seconds hour key) upserted into the warehouse on
    * its full group key (bucket, event_type).
    *
    * Runs in UPDATE output mode: every micro-batch emits the bars that
    * CHANGED, including hours still open — each re-emission replaces the
    * bar's previous version via the keyed merge, so the warehouse always
    * holds the latest state of every bar and converges to the batch
    * result once an hour stops changing. (Contrast the append-mode file
    * sink, which must wait for the watermark to finalize a window and can
    * never revise it.) Replays converge the same way the raw sink does.
    */
  def ohlcWarehouseSink(bars: DataFrame, outPath: String,
                        checkpoint: String,
                        availableNow: Boolean = true,
                        processingTime: Option[String] = None): StreamingQuery = {
    val w = bars.writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        upsertByMonth(
          batch.toDF().withColumn("bucket_ts", timestamp_seconds(col("bucket"))),
          Seq("bucket", "event_type"), "bucket_ts", outPath)
      }
      .option("checkpointLocation", checkpoint)
    w.trigger(pickTrigger(availableNow, processingTime)).start()
  }
}
