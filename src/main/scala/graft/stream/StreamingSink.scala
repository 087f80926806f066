package graft.stream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row}
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
  * The `localCheckpoint(eager)` calls are load-bearing twice over: they
  * pin the batch/existing rows so the read side is materialized BEFORE
  * the overwrite touches the directory (classic read-modify-write on one
  * path), and they break the lineage that would otherwise make Spark
  * refuse to overwrite a path it is also reading from. The materialized
  * volume is bounded by the affected partitions, not the table.
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
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (!fs.exists(new Path(path))) b
      else {
        val survivors = spark.read.parquet(path)
          .filter(col("month").isin(months.toSeq: _*)) // partition-pruned
          .join(b.select(keyCols.map(col): _*), keyCols, "left_anti")
          .localCheckpoint(true)
        b.unionByName(survivors)
      }
    merged.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("month")
      .parquet(path)
  }

  /** The streaming warehouse sink: every micro-batch MERGEs into the
    * month-partitioned warehouse via [[upsertByMonth]]. `AvailableNow`
    * drains the backlog and stops (the reference's monthly batch cadence
    * run through the streaming engine); pass `availableNow = false` for a
    * continuously running query.
    */
  def warehouseSink(stream: DataFrame, keyCol: String, tsCol: String,
                    outPath: String, checkpoint: String,
                    availableNow: Boolean = true): StreamingQuery = {
    val w = stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        upsertByMonth(batch.toDF(), keyCol, tsCol, outPath)
      }
      .option("checkpointLocation", checkpoint)
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

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
                        availableNow: Boolean = true): StreamingQuery = {
    val w = bars.writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        upsertByMonth(
          batch.toDF().withColumn("bucket_ts", timestamp_seconds(col("bucket"))),
          Seq("bucket", "event_type"), "bucket_ts", outPath)
      }
      .option("checkpointLocation", checkpoint)
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }
}
