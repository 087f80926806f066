package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming twin of the flagship hourly OHLC resample
  * (SURVEY §2.8): file source over a landing zone, event-time tumbling
  * window with a watermark for late rows, the same deterministic
  * `min_by`/`max_by` aggregates as the batch query
  * (`graft.ops.Resample.ohlcHourly`), which stays the oracle.
  *
  * The reference is pure batch on a monthly schedule
  * (`/root/reference/airflow/dags/new6.py:32-39`); this is the engine's
  * continuous-ingest form per the north star ("DataFrame + Structured
  * Streaming for crypto data").
  *
  * Scale notes: a tumbling-window hash aggregate keeps one state row per
  * (window, symbol) — state size tracks output cardinality, not input
  * rate. The watermark bounds state: windows older than (max event time −
  * 2 h) are finalized and evicted. Sink would be partitioned parquet with
  * checkpointing for exactly-once.
  */
object StreamingResample {

  /** Build the streaming hourly-OHLC DataFrame from a parquet landing
    * directory with the given schema (streams must declare schemas).
    * Output matches `Resample.ohlcHourly` column-for-column.
    */
  def hourlyOhlc(spark: SparkSession, inputDir: String,
                 schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        sum(col("value")).as("volume"),
        count(lit(1)).as("n_trades"))
      .select(
        unix_timestamp(col("window.start")).as("bucket"),
        col("event_type"), col("open"), col("high"), col("low"),
        col("close"), col("volume"), col("n_trades"))
}
