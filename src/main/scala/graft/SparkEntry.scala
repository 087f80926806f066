package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.Tables
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 gets one named entry in
  * [[queries]]; the SQL-expressible ones get a DuckDB oracle in
  * [[oracleSql]] over the same parquet tables (driver registers each
  * `<table>.parquet` under its bare table name). Column names/aliases are
  * kept identical on both sides — the driver sorts columns by name before
  * hashing values.
  */
object SparkEntry {

  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)
  private def li(s: SparkSession, d: String): DataFrame = Tables.lineitem(s, d)

  /** Flagship query on sf=0.001: the 1 s → 1 h OHLC resample
    * (reference `components/process_data.py:44-59`) over the events table.
    * Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Resample.ohlcHourly(Tables.events(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1-A3/W2/F1-F3: flagship OHLC resample, time-native (scale path).
    "ohlc_hourly" -> ((s, d) => Resample.ohlcHourly(ev(s, d))),
    // W1/W2: the reference's exact row-position bucketing (comparison only).
    "ohlc_rowbucket" -> ((s, d) => Resample.ohlcRowBucket(ev(s, d), 500)),
    // W3/W4: rolling mean + stddev volatility bands on the hourly series.
    "ma_volatility" -> ((s, d) => Rolling.maVolatility(Resample.ohlcHourly(ev(s, d)))),
    // W5/W6: lag + pct_change returns.
    "returns_lag" -> ((s, d) => Rolling.returnsLag(ev(s, d))),
    // W7/U1: exact cumulative-product equity curve (custom Aggregator).
    "cumprod_equity" -> ((s, d) => Rolling.cumprodEquity(ev(s, d))),
    // P8+W3-W7: MA-crossover backtest as one composed query.
    "ma_crossover" -> ((s, d) => Rolling.maCrossoverBacktest(Resample.ohlcHourly(ev(s, d)))),
    // A6/J1: min-max scaling via broadcast grouped-stats join.
    "minmax_scale" -> ((s, d) => Rolling.minMaxScale(ev(s, d))),
    // A6 inverse: scale then algebraically un-scale (evaluation.py:71-72).
    "minmax_roundtrip" -> ((s, d) => Rolling.minMaxRoundtrip(ev(s, d))),
    // A7: RMSE/MAE vs persistence baseline.
    "rmse_mae" -> ((s, d) => Rolling.rmseMae(ev(s, d))),
    // W10: ordered 0.8/0.1/0.1 train/val/test split.
    "ordered_split" -> ((s, d) => Rolling.orderedSplit(ev(s, d))),
    // A4: summary statistics incl. exact quartiles.
    "summary_stats" -> ((s, d) => Stats.summaryStats(li(s, d))),
    // A5: pairwise Pearson correlation matrix.
    "corr_matrix" -> ((s, d) => Stats.corrMatrix(li(s, d))),
  )

  /** DuckDB oracle SQL per query (same column aliases as the Spark side). */
  def oracleSql: Map[String, String] = Map(
    "ohlc_hourly" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, event_type,
        | arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
        | arg_max(value, ts) AS close, sum(value) AS volume, count(*) AS n_trades
        |FROM events GROUP BY 1, 2""".stripMargin,
    "ohlc_rowbucket" ->
      """SELECT CAST(floor((rn - 1) / 500) AS BIGINT) AS group_id,
        | arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
        | arg_max(value, ts) AS close, sum(value) AS volume, count(*) AS n_trades
        |FROM (SELECT *, row_number() OVER (ORDER BY ts) AS rn FROM events)
        |GROUP BY 1""".stripMargin,
    "ma_volatility" ->
      """WITH hourly AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, event_type,
        |         arg_max(value, ts) AS close
        |  FROM events GROUP BY 1, 2)
        |SELECT bucket, event_type, close,
        | avg(close) OVER w7 AS ma7,
        | avg(close) OVER w30 AS ma30,
        | stddev_samp(close) OVER w30 AS sd30,
        | avg(close) OVER w30 + 2.0 * stddev_samp(close) OVER w30 AS band_hi,
        | avg(close) OVER w30 - 2.0 * stddev_samp(close) OVER w30 AS band_lo
        |FROM hourly
        |WINDOW
        | w7 AS (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
        | w30 AS (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)""".stripMargin,
    "returns_lag" ->
      """SELECT event_id, event_type, value,
        | lag(value, 1) OVER w AS prev_value,
        | value / lag(value, 1) OVER w - 1 AS ret
        |FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts)""".stripMargin,
    "cumprod_equity" ->
      """SELECT event_id, event_type, value, factor,
        | product(factor) OVER (PARTITION BY event_type ORDER BY ts
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS equity
        |FROM (SELECT *, coalesce(value / lag(value, 1) OVER
        |        (PARTITION BY event_type ORDER BY ts), 1.0) AS factor
        |      FROM events)""".stripMargin,
    "ma_crossover" ->
      """WITH hourly AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, event_type,
        |         arg_max(value, ts) AS close
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT bucket, event_type, close,
        |   avg(close) OVER (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7,
        |   avg(close) OVER (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS ma30,
        |   lag(close, 1) OVER (PARTITION BY event_type ORDER BY bucket) AS prev_close
        |  FROM hourly),
        |s AS (
        |  SELECT *, CASE WHEN ma7 > ma30 THEN 1 ELSE 0 END AS signal,
        |         close / prev_close - 1 AS ret
        |  FROM m),
        |p AS (
        |  SELECT *, coalesce(lag(signal, 1) OVER (PARTITION BY event_type ORDER BY bucket), 0) AS position
        |  FROM s),
        |f AS (SELECT *, coalesce(1.0 + position * ret, 1.0) AS strat_factor FROM p)
        |SELECT bucket, event_type, close, ma7, ma30, signal, position,
        | product(strat_factor) OVER (PARTITION BY event_type ORDER BY bucket
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS equity
        |FROM f""".stripMargin,
    "minmax_scale" ->
      """SELECT event_id, event_type, value, mn, mx,
        | CASE WHEN mx = mn THEN 0.0 ELSE (value - mn) / (mx - mn) END AS scaled
        |FROM (SELECT event_id, event_type, value,
        |        min(value) OVER (PARTITION BY event_type) AS mn,
        |        max(value) OVER (PARTITION BY event_type) AS mx
        |      FROM events)""".stripMargin,
    "minmax_roundtrip" ->
      """SELECT event_id, event_type, value, scaled,
        | scaled * (mx - mn) + mn AS unscaled
        |FROM (SELECT event_id, event_type, value, mn, mx,
        |        CASE WHEN mx = mn THEN 0.0 ELSE (value - mn) / (mx - mn) END AS scaled
        |      FROM (SELECT event_id, event_type, value,
        |              min(value) OVER (PARTITION BY event_type) AS mn,
        |              max(value) OVER (PARTITION BY event_type) AS mx
        |            FROM events))""".stripMargin,
    "rmse_mae" ->
      """SELECT event_type,
        | sqrt(avg(power(value - yhat, 2))) AS rmse,
        | avg(abs(value - yhat)) AS mae,
        | count(*) AS n
        |FROM (SELECT event_type, value,
        |        lag(value, 1) OVER (PARTITION BY event_type ORDER BY ts) AS yhat
        |      FROM events)
        |WHERE yhat IS NOT NULL GROUP BY event_type""".stripMargin,
    "ordered_split" ->
      """SELECT event_type, split, count(*) AS n_rows, sum(value) AS sum_value
        |FROM (SELECT event_type, value,
        |        CASE WHEN rn <= 0.8 * n THEN 'train'
        |             WHEN rn <= 0.9 * n THEN 'val'
        |             ELSE 'test' END AS split
        |      FROM (SELECT event_type, value,
        |              row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
        |              count(*) OVER (PARTITION BY event_type) AS n
        |            FROM events))
        |GROUP BY 1, 2""".stripMargin,
    "summary_stats" ->
      """SELECT count(*) AS n,
        | avg(l_quantity) AS avg_qty, stddev_samp(l_quantity) AS std_qty,
        | min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        | quantile_cont(l_quantity, 0.25) AS q1_qty,
        | quantile_cont(l_quantity, 0.50) AS med_qty,
        | quantile_cont(l_quantity, 0.75) AS q3_qty,
        | avg(l_extendedprice) AS avg_price, stddev_samp(l_extendedprice) AS std_price,
        | min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
        | avg(l_discount) AS avg_disc, min(l_discount) AS min_disc,
        | max(l_discount) AS max_disc
        |FROM lineitem""".stripMargin,
    "corr_matrix" ->
      """SELECT
        | corr(l_quantity, l_extendedprice) AS corr_qty_price,
        | corr(l_quantity, l_discount) AS corr_qty_disc,
        | corr(l_quantity, l_tax) AS corr_qty_tax,
        | corr(l_extendedprice, l_discount) AS corr_price_disc,
        | corr(l_extendedprice, l_tax) AS corr_price_tax,
        | corr(l_discount, l_tax) AS corr_disc_tax,
        | covar_samp(l_quantity, l_extendedprice) AS cov_qty_price
        |FROM lineitem""".stripMargin,
  )
}
