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

  case class VbState(cumUnits: Long, bar: Long, open: Double, high: Double,
      low: Double, close: Double, volume: Double, n: Long, started: Boolean)

  case class VbOut(event_type: String, bar: Long, open: Double, high: Double,
      low: Double, close: Double, volume: Double, n_trades: Long)

  private def updateVolumeBars(barUnits: Long)(
      key: String, rows: Iterator[Tick],
      state: GroupState[VbState]): Iterator[VbOut] = {
    var s = state.getOption.getOrElse(
      VbState(0L, 0L, 0.0, 0.0, 0.0, 0.0, 0.0, 0L, started = false))
    val out = scala.collection.mutable.ArrayBuffer[VbOut]()
    // batch iterators carry no order guarantee — sort by event time (the
    // same contract as runningEma; cross-batch order is append order)
    rows.toArray.sortBy(_.ts_us).foreach { t =>
      val units = math.round(t.value * 1000) // = Spark round(): HALF_UP ≥ 0
      val tickBar = s.cumUnits / barUnits    // prefix-BEFORE-tick semantics
      if (!s.started)
        s = VbState(s.cumUnits + units, tickBar,
          t.value, t.value, t.value, t.value, t.value, 1L, started = true)
      else if (tickBar != s.bar) {
        out += VbOut(key, s.bar, s.open, s.high, s.low, s.close, s.volume, s.n)
        s = VbState(s.cumUnits + units, tickBar,
          t.value, t.value, t.value, t.value, t.value, 1L, started = true)
      } else
        s = s.copy(cumUnits = s.cumUnits + units,
          high = math.max(s.high, t.value), low = math.min(s.low, t.value),
          close = t.value, volume = s.volume + t.value, n = s.n + 1)
    }
    state.update(s)
    out.iterator
  }

  /** Streaming volume bars — the stateful twin of
    * [[graft.ops.Resample.volumeBars]]: per symbol, the running
    * integer-unit cumsum decides each tick's bar (the same
    * prefix-before-tick arithmetic as the batch op, so emitted bars are
    * IDENTICAL to the batch bars), and a bar is emitted the moment a
    * tick lands past its edge. State is O(1) per key (one long cursor +
    * the open bar's aggregates); emission is append-mode — each
    * completed bar exactly once, the in-progress bar stays in state
    * until its edge arrives. The streaming form of information-driven
    * resampling: quiet symbols emit rarely, bursts emit often, with no
    * timer logic at all.
    */
  def volumeBars(spark: SparkSession, inputDir: String, schema: StructType,
                 barUnits: Long,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader
      .parquet(inputDir)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[Tick]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        updateVolumeBars(barUnits))
      .toDF()
  }

  case class EmaState(num: Double, den: Double, n: Long)

  case class EmaOut(event_type: String, n: Long, ema: Double)

  private def updateEma(alpha: Double)(key: String, rows: Iterator[Tick],
                                       state: GroupState[EmaState]): EmaOut = {
    val keep = 1.0 - alpha
    var s = state.getOption.getOrElse(EmaState(0.0, 0.0, 0L))
    // a micro-batch's group iterator carries NO ordering guarantee — sort
    // the batch by event time before folding (cross-batch order is the
    // source's append order, the same assumption every running indicator
    // makes; true late data needs the windowed/watermarked tier instead)
    rows.toArray.sortBy(_.ts_us).foreach { t =>
      s = EmaState(keep * s.num + t.value, keep * s.den + 1.0, s.n + 1)
    }
    state.update(s)
    EmaOut(key, s.n, s.num / s.den)
  }

  /** Streaming EMA per symbol — the running-state twin of
    * [[graft.ops.Rolling.ewma]]: the same (num, den) affine recursion
    * the batch Aggregator carries, folded tick-by-tick in
    * `mapGroupsWithState`. State is O(1) per key (two doubles + a
    * count), so state size tracks symbol cardinality, not throughput;
    * each update-mode emission is the series-final EMA so far, equal to
    * the batch [[graft.ops.Rolling.ewma]]'s last row for the same
    * prefix (spec pins ≤ 1e-12 across multi-batch replays).
    */
  def runningEma(spark: SparkSession, inputDir: String, schema: StructType,
                 alpha: Double,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader
      .parquet(inputDir)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[Tick]
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateEma(alpha))
      .toDF()
  }

  case class FlowTick(event_type: String, ts_us: Long, value: Double, qty: Double)

  /** Tick-rule state: the LAST price and last NON-ZERO sign are exactly
    * what the Lee–Ready carry needs across micro-batch boundaries — a
    * flat tick opening a batch inherits the sign of a move that arrived
    * in an earlier batch. O(1) per key.
    */
  case class FlowState(lastValue: Double, lastSign: Int,
                       buy: Double, sell: Double, n: Long, seeded: Boolean)

  case class FlowOut(event_type: String, buy_qty: Double, sell_qty: Double,
                     n_classified: Long, ofi: Double)

  private def updateFlow(key: String, rows: Iterator[FlowTick],
                         state: GroupState[FlowState]): FlowOut = {
    var s = state.getOption.getOrElse(
      FlowState(Double.NaN, 0, 0.0, 0.0, 0L, seeded = false))
    rows.toSeq.sortBy(_.ts_us).foreach { t =>
      if (!s.seeded) s = s.copy(lastValue = t.value, seeded = true)
      else {
        val sgn =
          if (t.value > s.lastValue) 1
          else if (t.value < s.lastValue) -1
          else s.lastSign // zero-change carry (0 until the first move)
        s = FlowState(
          lastValue = t.value, lastSign = sgn,
          buy = if (sgn == 1) s.buy + t.qty else s.buy,
          sell = if (sgn == -1) s.sell + t.qty else s.sell,
          n = if (sgn != 0) s.n + 1 else s.n, seeded = true)
      }
    }
    state.update(s)
    val tot = s.buy + s.sell
    FlowOut(key, s.buy, s.sell, s.n,
      if (tot == 0.0) Double.NaN else (s.buy - s.sell) / tot)
  }

  /** Streaming tick-rule signed order flow per symbol — the stateful
    * twin of [[graft.ops.Microstructure.tickRuleFlow]] as running
    * totals: per-tick buy/sell classification needs the PREVIOUS tick's
    * price and the last non-zero sign, which live in mapGroupsWithState
    * state and survive micro-batch (and restart) boundaries. Update
    * output mode; running OFI is NaN until the first classified tick.
    */
  def runningFlow(spark: SparkSession, inputDir: String, schema: StructType,
                  maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader
      .parquet(inputDir)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
        col("value"),
        coalesce(get_json_object(col("props"), "$.k").cast("double"),
          lit(0.0)).as("qty"))
      .as[FlowTick]
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateFlow)
      .toDF()
  }
}
