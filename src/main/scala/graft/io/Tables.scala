package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Readers for the driver-generated star-schema test tables (TESTDATA.md).
  *
  * One parquet file per table; schemas come from the parquet footers (the
  * driver owns them). The reference's own ingest surface — explicit-schema
  * header-less CSV and parquet scans with a declared StructType
  * (`/root/reference/components/process_data.py:27-42`,
  * `components/btcusdt_ingest_data.py:11-34`) — lives in
  * [[graft.io.Sources]]; these helpers are the harness-facing entry points.
  *
  * Scale note: each is a plain `spark.read.parquet`, so Catalyst's column
  * pruning and predicate pushdown reach the scan untouched. Do NOT cache or
  * materialize here — at 100 TB the winning move is to let every query
  * prune/push into its own scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame    = table(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = table(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = table(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = table(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = table(s, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * natively (PARQUET_TYPE_ILLEGAL). Read it as a long (nanos since epoch)
    * via the legacy conf, then convert to a proper TimestampType at µs
    * precision — lossless here because the generator emits µs-resolution
    * values (ns component is always a multiple of 1000).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
  }
  def documents(s: SparkSession, dir: String): DataFrame = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")
}
