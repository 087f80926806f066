package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Custom streaming state via `mapGroupsWithState` — the API tier for
  * semantics tumbling windows can't express (running totals that never
  * reset, last-observation carry, per-key session logic with bespoke
  * transitions).
  *
  * This op keeps one running accumulator per symbol: total volume, trade
  * count, running high/low, and the latest price by event time. State is
  * O(1) per key (five scalars), so at 100 TB state size tracks symbol
  * cardinality, not throughput; no watermark needed because the state
  * never expires (use `GroupStateTimeout` + watermark where keys churn).
  */
object StatefulRunning {

  case class Tick(event_type: String, ts_us: Long, value: Double)

  case class RunningState(
      totalVolume: Double, n: Long, high: Double, low: Double,
      lastTsUs: Long, lastValue: Double)

  case class RunningOut(
      event_type: String, total_volume: Double, n: Long,
      high: Double, low: Double, last_value: Double)

  private def update(key: String, rows: Iterator[Tick],
                     state: GroupState[RunningState]): RunningOut = {
    var s = state.getOption.getOrElse(
      RunningState(0.0, 0L, Double.MinValue, Double.MaxValue, Long.MinValue, Double.NaN))
    rows.foreach { t =>
      s = RunningState(
        totalVolume = s.totalVolume + t.value,
        n = s.n + 1,
        high = math.max(s.high, t.value),
        low = math.min(s.low, t.value),
        lastTsUs = math.max(s.lastTsUs, t.ts_us),
        lastValue = if (t.ts_us >= s.lastTsUs) t.value else s.lastValue)
    }
    state.update(s)
    RunningOut(key, s.totalVolume, s.n, s.high, s.low, s.lastValue)
  }

  /** Streaming running-stats per symbol from a parquet landing dir.
    * Output mode must be `update` (one row per touched key per batch).
    */
  def runningStats(spark: SparkSession, inputDir: String,
                   schema: StructType): DataFrame = {
    import spark.implicits._
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[Tick]
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
      .toDF()
  }

  /** Batch oracle for the streaming op: the same running stats computed
    * relationally — equality on replay proves the state transitions.
    */
  def runningStatsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        sum(col("value")).as("total_volume"),
        count(lit(1)).as("n"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("last_value"))
}
