package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-microstructure and risk diagnostics over the tick stream — the
  * analytics a trading-data platform layers on the reference's OHLC
  * pipeline (`/root/reference/components/process_data.py:44-59` produces
  * the bars; the notebook's indicator cells stop at moving averages).
  * Everything here is EXACT algebra — one or two codegen'd window
  * passes plus a hash aggregate for most operators; the two smoothing
  * recursions ([[dmi]]'s Wilder EWMs, [[kama]]'s varying-α line) ride
  * exact associative Aggregators ([[graft.agg.EwmaAgg]] /
  * [[graft.agg.KamaAgg]]) in the same window pass — and every operator
  * has a SQL oracle (closed-form or chunk-carry).
  *
  * Scale shape shared by all of them: the only shuffle is the per-symbol
  * window repartition (event_type), identical to the partitioning every
  * indicator in [[Rolling]] already pays; downstream aggregates are
  * map-side combined and emit rows proportional to symbols × buckets,
  * never ticks. At 100 TB the tick scan dominates and each operator
  * reads it exactly once.
  */
object Microstructure {

  private def byTypeTime = Window.partitionBy(col("event_type")).orderBy(col("ts"))

  /** Hourly VWAP per symbol: Σ(price·size)/Σ(size) with the per-tick size
    * taken from the event's JSON props (`$.k` — the reference's payload
    * convention, cf. [[Functions.jsonProps]]). The volume-weighted twin
    * of [[Resample.twapHourly]]: TWAP weights by holding TIME, VWAP by
    * traded SIZE — the execution-quality benchmark. Ticks with no/zero
    * size contribute nothing to the weighted mean but still count in
    * n_trades; an all-zero-size bar yields NULL vwap (`try_divide`).
    *
    * One `get_json_object` projection inside the scan stage, then the
    * same partial+final hash aggregate as the flagship OHLC — no window,
    * no extra shuffle.
    */
  def vwapHourly(events: DataFrame): DataFrame =
    events
      .withColumn("qty", get_json_object(col("props"), "$.k").cast("double"))
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("bucket"),
        col("event_type"))
      .agg(
        try_divide(sum(col("value") * col("qty")), sum(col("qty"))).as("vwap"),
        sum(col("qty")).as("total_qty"),
        count(lit(1)).as("n_trades"))

  /** Daily realized-volatility estimators from hourly OHLC bars:
    * Parkinson (range-based, `sqrt(avg(ln(h/l)²) / (4·ln 2))`) and
    * Garman–Klass (`sqrt(avg(0.5·ln(h/l)² − (2·ln2 − 1)·ln(c/o)²))`) per
    * (day, symbol). Both use intra-bar range information a close-to-close
    * estimator throws away — 5–7× more efficient per observation, the
    * standard daily risk number built from bar artifacts instead of
    * rescanning ticks. Bars with a non-positive side are excluded (log
    * undefined; cannot occur for a positive price stream but the guard
    * keeps the algebra total).
    *
    * Composes on the RESAMPLED series: aggregate of an aggregate, rows =
    * symbols × days. GK can go negative on pathological bars (its known
    * bias-correction artifact) — `sqrt` of a negative is NULL, reported
    * as such rather than clamped.
    */
  def realizedVol(bars: DataFrame): DataFrame = {
    val lhl = log(col("high") / col("low"))
    val lco = log(col("close") / col("open"))
    bars
      .filter(col("low") > 0 && col("open") > 0)
      .groupBy(to_date(timestamp_seconds(col("bucket"))).as("day"),
        col("event_type"))
      .agg(
        sqrt(avg(lhl * lhl) / (4.0 * math.log(2.0))).as("parkinson"),
        sqrt(avg(lhl * lhl * 0.5 - lco * lco * (2.0 * math.log(2.0) - 1.0)))
          .as("garman_klass"),
        count(lit(1)).as("n_bars"))
  }

  /** Roll's implied effective spread per symbol:
    * `2·sqrt(−cov(Δp_t, Δp_{t−1}))` when the serial covariance of price
    * changes is negative (bid–ask bounce), NULL otherwise (the estimator
    * is undefined on positive covariance — reported honestly instead of
    * clamped to 0, and the sign is visible in the `cov_dp` column). The
    * classic trade-data-only transaction-cost estimate (Roll 1984).
    *
    * Two lag windows (Δp and its lag — same partition/order, one sort)
    * feeding `covar_samp`; output is one row per symbol.
    */
  def rollSpread(events: DataFrame): DataFrame = {
    val dp  = col("value") - lag(col("value"), 1).over(byTypeTime)
    events
      .withColumn("dp", dp)
      .withColumn("dp_prev", lag(col("dp"), 1).over(byTypeTime))
      .groupBy(col("event_type"))
      .agg(
        covar_samp(col("dp"), col("dp_prev")).as("cov_dp"),
        count(col("dp_prev")).as("n_pairs"))
      .withColumn("roll_spread",
        when(col("cov_dp") < 0, lit(2.0) * sqrt(-col("cov_dp"))))
  }

  /** Lo–MacKinlay variance-ratio diagnostic per symbol:
    * `VR(q) = var(q-step change) / (q · var(1-step change))` over
    * NON-overlapping q-tick windows, for q ∈ `qs`. A random walk gives
    * VR ≈ 1; mean reversion < 1; momentum > 1 — the stationarity check a
    * forecasting pipeline runs before trusting return features. Price
    * CHANGES (not log returns) keep the algebra total on any price path.
    *
    * The q-step series is the price at every q-th tick rank (one shared
    * row_number pass), differenced by a lag over the SAMPLED rows —
    * consecutive survivors of `rn % q = 0` are exactly q ticks apart, so
    * each dq spans q one-step changes, never q−1 (the off-by-one that
    * biases a within-block first/last construction toward VR=(q−1)/q).
    * Output rows = symbols × |qs|.
    */
  def varianceRatio(events: DataFrame, qs: Seq[Int] = Seq(2, 4, 8)): DataFrame = {
    // |qs|+1 branches consume the ranked frame; without a cut each one
    // re-derives the rank+lag window from the scan (Spark shares no
    // common sub-plans across DataFrame branches) — 4x the tick I/O.
    val ranked = Checkpoints.stable(events
      .withColumn("rn", row_number().over(byTypeTime) - 1)
      .withColumn("dp", col("value") - lag(col("value"), 1).over(byTypeTime)))
    val var1 = ranked.groupBy(col("event_type"))
      .agg(var_samp(col("dp")).as("var_1"), count(col("dp")).as("n_1"))
    val perQ = qs.map { q =>
      ranked
        .filter(col("rn") % q === 0)
        .withColumn("dq", col("value") - lag(col("value"), 1).over(byTypeTime))
        .groupBy(col("event_type"))
        .agg(var_samp(col("dq")).as("var_q"), count(col("dq")).as("n_q"))
        .withColumn("q", lit(q))
    }
    perQ.reduce(_ unionByName _)
      .join(var1, Seq("event_type"))
      .select(col("event_type"), col("q"), col("n_q"), col("n_1"),
        try_divide(col("var_q"), col("q") * col("var_1")).as("vr"))
  }

  /** Kaufman efficiency ratio per tick: `|p_t − p_{t−n}| / Σ|Δp|` over
    * the trailing n changes — net displacement over path length, 1 on a
    * straight trend, →0 in chop. The adaptive-smoothing front end (KAMA
    * gears its EMA span by this) and a regime feature in its own right.
    * Rows with fewer than n prior ticks report NULL (strict min_periods,
    * like [[Rolling.maVolatility]]'s strict form); a flat window (zero
    * path length) is NULL via `try_divide`.
    *
    * One lag + one trailing-sum window over the SAME per-symbol sort —
    * Catalyst plans both in a single WindowExec pass.
    */
  def kaufmanEr(events: DataFrame, n: Int = 10): DataFrame = {
    require(n >= 1, s"n $n must be >= 1")
    val wTrail = byTypeTime.rowsBetween(-(n - 1), 0)
    events
      .withColumn("dp", col("value") - lag(col("value"), 1).over(byTypeTime))
      .withColumn("p_n", lag(col("value"), n).over(byTypeTime))
      .withColumn("path", sum(abs(col("dp"))).over(wTrail))
      .select(col("event_id"), col("event_type"), col("value"),
        when(col("p_n").isNotNull,
          try_divide(abs(col("value") - col("p_n")), col("path"))).as("er"))
  }

  /** Donchian channel over resampled OHLC bars: trailing n-bar
    * `max(high)` / `min(low)` (min_periods=1 at series start, like
    * [[Rolling.stochastic]]), the midline, the close's position in the
    * channel (0 = at the low rail, 1 = at the high rail, NULL on a flat
    * channel), and the breakout flag — close strictly above the PREVIOUS
    * bar's upper rail (the turtle-rule entry; the shifted rail keeps the
    * signal causal: a bar can't break a channel it itself extended).
    *
    * Two trailing extrema + one lag over one per-symbol bar sort; rows =
    * bars, not ticks.
    */
  def donchian(bars: DataFrame, n: Int = 20): DataFrame = {
    val byTypeBucket = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wN = byTypeBucket.rowsBetween(-(n - 1), 0)
    bars
      .withColumn("upper", max(col("high")).over(wN))
      .withColumn("lower", min(col("low")).over(wN))
      .withColumn("mid", (col("upper") + col("lower")) / 2.0)
      .withColumn("pos",
        try_divide(col("close") - col("lower"), col("upper") - col("lower")))
      .withColumn("breakout",
        coalesce(col("close") > lag(col("upper"), 1).over(byTypeBucket),
          lit(false)))
      .select(col("bucket"), col("event_type"), col("close"),
        col("upper"), col("lower"), col("mid"), col("pos"), col("breakout"))
  }

  /** Hourly OHLC bars carrying the JSON trade size as real volume:
    * the [[Resample.ohlcHourly]] aggregate plus `qty` = Σ props.$k — the
    * bar frame the money-flow indicators ([[mfi]], [[cmf]]) need, where
    * "volume" must be traded size, not the synthetic price-sum column.
    */
  def ohlcQtyHourly(events: DataFrame): DataFrame =
    events
      .withColumn("q", get_json_object(col("props"), "$.k").cast("double"))
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("bucket"),
        col("event_type"))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        sum(col("q")).as("qty"))

  /** Money Flow Index over qty-bars: typical price (h+l+c)/3 signs the
    * bar's raw money flow tp·qty; MFI = 100·posFlow/(posFlow+negFlow)
    * over the trailing n bars. The volume-weighted RSI — overbought/
    * oversold with SIZE behind it. First bar (no Δtp) and unchanged-tp
    * bars feed neither side (the classic convention); an all-flat window
    * is NULL (0/0).
    *
    * One lag + two trailing sums in a single per-symbol window pass over
    * bars.
    */
  def mfi(bars: DataFrame, n: Int = 14): DataFrame = {
    val byTypeBucket = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wN = byTypeBucket.rowsBetween(-(n - 1), 0)
    val tp = (col("high") + col("low") + col("close")) / 3.0
    bars
      .withColumn("tp", tp)
      .withColumn("dtp", col("tp") - lag(col("tp"), 1).over(byTypeBucket))
      .withColumn("pos", when(col("dtp") > 0, col("tp") * col("qty")).otherwise(0.0))
      .withColumn("neg", when(col("dtp") < 0, col("tp") * col("qty")).otherwise(0.0))
      .withColumn("pos_flow", sum(col("pos")).over(wN))
      .withColumn("neg_flow", sum(col("neg")).over(wN))
      .select(col("bucket"), col("event_type"), col("tp"),
        col("pos_flow"), col("neg_flow"),
        (lit(100.0) * try_divide(col("pos_flow"),
          col("pos_flow") + col("neg_flow"))).as("mfi"))
  }

  /** Chaikin Money Flow over qty-bars: the close's position in the bar's
    * range scales its volume into money-flow volume
    * `((c−l)−(h−c))/(h−l)·qty` (a flat bar contributes 0 — the h=l
    * 0/0 is coalesced, the standard convention); CMF = Σmfv/Σqty over
    * the trailing n bars — accumulation/distribution pressure in
    * [−1, 1]. A zero-qty window is NULL.
    */
  def cmf(bars: DataFrame, n: Int = 20): DataFrame = {
    val byTypeBucket = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wN = byTypeBucket.rowsBetween(-(n - 1), 0)
    bars
      .withColumn("mfv",
        coalesce(try_divide((col("close") - col("low")) - (col("high") - col("close")),
          col("high") - col("low")), lit(0.0)) * col("qty"))
      .select(col("bucket"), col("event_type"),
        try_divide(sum(col("mfv")).over(wN), sum(col("qty")).over(wN)).as("cmf"))
  }

  /** Commodity Channel Index over OHLC bars: deviation of typical price
    * from its n-bar SMA, scaled by the window's MEAN ABSOLUTE DEVIATION
    * about that same SMA — the part a plain window aggregate can't
    * express, computed here by collecting the n window values and
    * folding |tp_i − sma_t| with a codegen'd higher-order `aggregate`
    * (window arrays are ≤ n elements — bounded, never corpus-sized).
    * A zero-MAD (flat) window is NULL via `try_divide`.
    */
  def cci(bars: DataFrame, n: Int = 20): DataFrame = {
    val byTypeBucket = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wN = byTypeBucket.rowsBetween(-(n - 1), 0)
    bars
      .withColumn("tp", (col("high") + col("low") + col("close")) / 3.0)
      .withColumn("sma", avg(col("tp")).over(wN))
      .withColumn("arr", collect_list(col("tp")).over(wN))
      .withColumn("mad",
        aggregate(col("arr"), lit(0.0),
          (acc, x) => acc + abs(x - col("sma"))) / size(col("arr")))
      .select(col("bucket"), col("event_type"), col("tp"), col("sma"),
        col("mad"),
        try_divide(col("tp") - col("sma"), lit(0.015) * col("mad")).as("cci"))
  }

  /** Directional movement (+DI/−DI/DX) over OHLC bars: up-move h−h₋₁ and
    * down-move l₋₁−l gate each other (only the strictly larger, positive
    * one counts — first bar counts as no movement), each smoothed by the
    * same `ewm(alpha=1/n, adjust=True)` recursion as [[Rolling.rsi]]/
    * [[Rolling.atr]], normalized by the smoothed true range;
    * DX = 100·|+DI−−DI|/(+DI+−DI) is the trend-STRENGTH reading the ADX
    * family averages. Three EWM aggregators ride ONE window pass (same
    * frame), after one lag pass — two sorts of #bars total.
    */
  def dmi(bars: DataFrame, n: Int = 14): DataFrame = {
    val byTypeBucket = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wGrow = byTypeBucket.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val alpha = 1.0 / n
    bars
      .withColumn("up", col("high") - lag(col("high"), 1).over(byTypeBucket))
      .withColumn("dn", lag(col("low"), 1).over(byTypeBucket) - col("low"))
      .withColumn("prev_close", lag(col("close"), 1).over(byTypeBucket))
      .withColumn("pdm",
        when(col("up") > col("dn") && col("up") > 0, col("up")).otherwise(0.0))
      .withColumn("mdm",
        when(col("dn") > col("up") && col("dn") > 0, col("dn")).otherwise(0.0))
      .withColumn("tr", greatest(col("high") - col("low"),
        abs(col("high") - col("prev_close")),
        abs(col("low") - col("prev_close"))))
      .withColumn("sm_p", graft.agg.Ewma.ewma(col("pdm"), alpha).over(wGrow))
      .withColumn("sm_m", graft.agg.Ewma.ewma(col("mdm"), alpha).over(wGrow))
      .withColumn("sm_t", graft.agg.Ewma.ewma(col("tr"), alpha).over(wGrow))
      .withColumn("di_plus", lit(100.0) * try_divide(col("sm_p"), col("sm_t")))
      .withColumn("di_minus", lit(100.0) * try_divide(col("sm_m"), col("sm_t")))
      .select(col("bucket"), col("event_type"), col("di_plus"), col("di_minus"),
        (lit(100.0) * try_divide(abs(col("di_plus") - col("di_minus")),
          col("di_plus") + col("di_minus"))).as("dx"))
  }

  /** Ichimoku system over hourly OHLC bars, as CAUSAL per-bar features:
    * tenkan (9-bar midline), kijun (26-bar midline), and the cloud AT
    * the current bar — senkou A/B are the conventional forward-displaced
    * spans read back at their display position (`lag` by the kijun
    * horizon of the midline pair / 52-bar midline), so no feature ever
    * reads the future (the lookahead bias a naive `lead` spelling bakes
    * into training data). `above_cloud` compares the close to the upper
    * cloud rail; warm-up bars (no spans yet) coalesce to false — the
    * [[donchian]] breakout convention.
    *
    * Four trailing extrema + two lags over ONE per-symbol bar sort —
    * Catalyst plans a single WindowExec pass; rows = bars.
    */
  def ichimoku(bars: DataFrame, tenkan: Int = 9, kijun: Int = 26,
               senkou: Int = 52): DataFrame = {
    val byTypeBucket = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    def mid(n: Int) =
      (max(col("high")).over(byTypeBucket.rowsBetween(-(n - 1), 0)) +
        min(col("low")).over(byTypeBucket.rowsBetween(-(n - 1), 0))) / 2.0
    bars
      .withColumn("tenkan", mid(tenkan))
      .withColumn("kijun", mid(kijun))
      .withColumn("senkou_a",
        lag((col("tenkan") + col("kijun")) / 2.0, kijun).over(byTypeBucket))
      .withColumn("senkou_b", lag(mid(senkou), kijun).over(byTypeBucket))
      .select(col("bucket"), col("event_type"), col("close"),
        col("tenkan"), col("kijun"), col("senkou_a"), col("senkou_b"),
        coalesce(col("close") > greatest(col("senkou_a"), col("senkou_b")),
          lit(false)).as("above_cloud"))
  }

  /** Tick-rule signed order flow (the Lee–Ready tick test): each trade
    * is classified buyer- or seller-initiated by its price change, with
    * zero-change ticks inheriting the LAST NON-ZERO sign (the standard
    * carry — `last_value(…, ignoreNulls)` over the growing per-symbol
    * frame); ticks before any price move stay unclassified and are
    * excluded. Hourly per-symbol aggregate of signed size (props.$k):
    * buy/sell volume and the order-flow imbalance
    * `(buy−sell)/(buy+sell)` — THE microstructure feature short-horizon
    * price models train on. One lag + one carry window on the same
    * per-symbol sort, then the flagship-shaped hash aggregate.
    */
  def tickRuleFlow(events: DataFrame): DataFrame = {
    val dp = col("value") - lag(col("value"), 1).over(byTypeTime)
    val wGrow = byTypeTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("qty", get_json_object(col("props"), "$.k").cast("double"))
      .withColumn("sgn_raw",
        when(dp > 0, 1).when(dp < 0, -1).otherwise(lit(null).cast("int")))
      .withColumn("sgn", last(col("sgn_raw"), ignoreNulls = true).over(wGrow))
      .filter(col("sgn").isNotNull)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("bucket"),
        col("event_type"))
      .agg(
        sum(when(col("sgn") === 1, col("qty")).otherwise(0.0)).as("buy_qty"),
        sum(when(col("sgn") === -1, col("qty")).otherwise(0.0)).as("sell_qty"),
        count(lit(1)).as("n_classified"))
      .select(col("bucket"), col("event_type"),
        col("buy_qty"), col("sell_qty"), col("n_classified"),
        try_divide(col("buy_qty") - col("sell_qty"),
          col("buy_qty") + col("sell_qty")).as("ofi"))
  }

  /** Run-length distribution of price-change signs per symbol (the
    * runs-test view): flats are excluded, consecutive same-sign changes
    * form a run, and the output is the (symbol, direction, length)
    * histogram — too many long runs = momentum, too many length-1 runs
    * = mean reversion, and the table IS the empirical distribution a
    * runs test (Wald–Wolfowitz) scores. One lag pass for signs, one
    * change-flag prefix sum for run ids (both on the same per-symbol
    * sort), two map-side-combined aggregates; rows out = distinct
    * (symbol, direction, length) — bounded by the longest run.
    */
  def runLengths(events: DataFrame): DataFrame = {
    val dp = col("value") - lag(col("value"), 1).over(byTypeTime)
    val wGrow = byTypeTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("d",
        when(dp > 0, 1).when(dp < 0, -1).otherwise(lit(null).cast("int")))
      .filter(col("d").isNotNull)
      .withColumn("chg",
        when(col("d") === lag(col("d"), 1).over(byTypeTime), 0).otherwise(1))
      .withColumn("rid", sum(col("chg")).over(wGrow))
      .groupBy(col("event_type"), col("rid"), col("d"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("event_type"), col("d").as("direction"), col("run_len"))
      .agg(count(lit(1)).as("n_runs"))
  }

  /** Kaufman Adaptive Moving Average over hourly bars — the EMA whose
    * span GEARS ITSELF by the efficiency ratio ([[kaufmanEr]], here at
    * bar level with warm-up/flat er coalesced to 0 so the recursion is
    * total): sc_t = (er_t·(fastSc−slowSc) + slowSc)², KAMA_t =
    * KAMA_{t−1} + sc_t·(KAMA-gap), seeded at the first close. Fast in
    * trends, near-frozen in chop — the adaptive smoother the fixed-α
    * [[Rolling]] EMAs can't express.
    *
    * The varying-α recursion rides [[graft.agg.KamaAgg]] (affine-map
    * composition — exact, associative, one growing-frame window pass);
    * er/sc are one lag + one trailing sum on the SAME per-symbol sort,
    * so Catalyst plans a single WindowExec stage. The oracle replays
    * the identical algebra through a block-local log-space prefix + a
    * recursive carry over 500-row blocks (the rsi/atr chunk-carry
    * template generalized to per-row decay).
    */
  def kama(bars: DataFrame, n: Int = 10, fast: Int = 2, slow: Int = 30): DataFrame = {
    require(n >= 1 && fast >= 1 && slow > fast,
      s"need n >= 1 and slow > fast >= 1, got n=$n fast=$fast slow=$slow")
    val byTypeBucket = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wGrow = byTypeBucket.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wN = byTypeBucket.rowsBetween(-(n - 1), 0)
    val fastSc = 2.0 / (fast + 1.0)
    val slowSc = 2.0 / (slow + 1.0)
    bars
      .withColumn("dp", col("close") - lag(col("close"), 1).over(byTypeBucket))
      .withColumn("p_n", lag(col("close"), n).over(byTypeBucket))
      .withColumn("er", coalesce(
        try_divide(abs(col("close") - col("p_n")),
          sum(abs(col("dp"))).over(wN)), lit(0.0)))
      .withColumn("sc",
        pow(col("er") * (lit(fastSc) - lit(slowSc)) + lit(slowSc), 2.0))
      .select(col("bucket"), col("event_type"), col("close"),
        col("er"), col("sc"),
        graft.agg.Kama.kama(col("close"), col("sc")).over(wGrow).as("kama"))
  }

  /** Binomial weights of (1−B)^d truncated at `window` terms —
    * w₀ = 1, w_k = −w_{k−1}·(d−k+1)/k. Driver-side; shared verbatim by
    * the operator and its generated oracle SQL (one edit changes both).
    */
  private[graft] def fracDiffWeights(d: Double, window: Int): Array[Double] = {
    val w = Array.ofDim[Double](window)
    w(0) = 1.0
    for (k <- 1 until window) w(k) = -w(k - 1) * (d - k + 1) / k
    w
  }

  /** Fixed-width fractional differencing of the close series (López de
    * Prado's stationarity-with-memory transform): x̃_t = Σ w_k·close_{t−k}
    * with the binomial weights of (1−B)^d truncated at `window` — d=1
    * recovers plain differencing (all memory gone), d→0 the raw series;
    * fractional d keeps long memory while making the series stationary
    * enough to train on. The standard feature-engineering front end for
    * price-based ML, missing from every fixed-lag indicator.
    *
    * One window pass: `window` lags over the per-symbol bar sort fold
    * into a single projection (exact dot product with driver-side
    * weights — no recursion, no approximation). Rows before the full
    * window report NULL (strict min_periods, via natural NULL
    * propagation through the lag sum).
    */
  def fracDiff(bars: DataFrame, d: Double = 0.4, window: Int = 20): DataFrame = {
    require(window >= 2, s"window $window must be >= 2")
    val byTypeBucket = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val fd = fracDiffWeights(d, window).zipWithIndex.map { case (wk, k) =>
      lit(wk) * lag(col("close"), k).over(byTypeBucket)
    }.reduce(_ + _)
    bars.select(col("bucket"), col("event_type"), col("close"),
      fd.as("frac_diff"))
  }

  /** Daily realized return MOMENTS per symbol from hourly bars: skewness
    * and excess kurtosis of the day's bar-to-bar returns — the crash-
    * asymmetry / fat-tail diagnostics a risk layer reads next to
    * [[realizedVol]]. Computed from raw power sums (μ, Σr², Σr³, Σr⁴
    * recombined with the textbook central-moment identities — the SAME
    * algebra the oracle spells, so results hash-match), population form;
    * a flat day (zero variance) is NULL via `try_divide`.
    *
    * One bar-level lag window + one (day, symbol) hash aggregate —
    * map-side combined, rows out = symbols × days.
    */
  def returnMoments(bars: DataFrame): DataFrame = {
    val byTypeBucket = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    bars
      .withColumn("r", col("close") / lag(col("close"), 1).over(byTypeBucket) - 1.0)
      .filter(col("r").isNotNull)
      .groupBy(to_date(timestamp_seconds(col("bucket"))).as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n_rets"),
        avg(col("r")).as("mu"),
        avg(col("r") * col("r")).as("p2"),
        avg(col("r") * col("r") * col("r")).as("p3"),
        avg(col("r") * col("r") * col("r") * col("r")).as("p4"))
      .select(col("day"), col("event_type"), col("n_rets"),
        col("mu"),
        (col("p2") - col("mu") * col("mu")).as("m2"),
        try_divide(
          col("p3") - lit(3.0) * col("mu") * col("p2")
            + lit(2.0) * col("mu") * col("mu") * col("mu"),
          pow(col("p2") - col("mu") * col("mu"), 1.5)).as("skew"),
        (try_divide(
          col("p4") - lit(4.0) * col("mu") * col("p3")
            + lit(6.0) * col("mu") * col("mu") * col("p2")
            - lit(3.0) * col("mu") * col("mu") * col("mu") * col("mu"),
          pow(col("p2") - col("mu") * col("mu"), 2.0)) - lit(3.0)).as("ex_kurt"))
  }

  /** Hurst exponent per symbol by classic rescaled-range (R/S) analysis:
    * for each block size n in `sizes`, split the symbol's 1-step change
    * series into consecutive complete n-blocks, compute per block
    * R = max−min of the within-block demeaned cumulative sum and
    * S = population stddev, average R/S across blocks, then fit
    * `log2(avg R/S) ~ H·log2(n)` — the slope is H (0.5 = random walk,
    * > 0.5 trending, < 0.5 mean-reverting). The long-memory diagnostic
    * behind "does this series reward trend features at all".
    *
    * Exact algebra end to end: one rank+lag pass per symbol (shared by
    * all sizes), per size a within-block cumulative window (blocks are
    * disjoint, so the window partitions by (symbol, block) — thousands
    * of small independent partitions, no single-partition funnel), a
    * per-block aggregate, a per-size average, and a final regr_slope
    * over |sizes| points per symbol. Work is |sizes| passes over the
    * change rows; rows out = symbols.
    */
  def hurstRs(events: DataFrame, sizes: Seq[Int] = Seq(32, 64, 128, 256)): DataFrame = {
    require(sizes.forall(_ >= 8), s"block sizes $sizes must be >= 8")
    // One materialized rank+lag pass shared by all |sizes| branches —
    // same cut as [[varianceRatio]]; without it each size re-scans ticks.
    val ranked = Checkpoints.stable(events
      .withColumn("dp", col("value") - lag(col("value"), 1).over(byTypeTime))
      .filter(col("dp").isNotNull)
      .withColumn("rn", row_number().over(byTypeTime) - 1))
    val perSize = sizes.map { n =>
      val wBlk = Window.partitionBy(col("event_type"), col("blk"))
        .orderBy(col("rn"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ranked
        .withColumn("blk", (col("rn") / n).cast("long"))
        .withColumn("mu", avg(col("dp"))
          .over(Window.partitionBy(col("event_type"), col("blk"))))
        .withColumn("cum", sum(col("dp") - col("mu")).over(wBlk))
        .groupBy(col("event_type"), col("blk"))
        .agg(count(lit(1)).as("m"),
          (max(col("cum")) - min(col("cum"))).as("r"),
          stddev_pop(col("dp")).as("s"))
        .filter(col("m") === n && col("s") > 0)
        .groupBy(col("event_type"))
        .agg(avg(col("r") / col("s")).as("rs"), count(lit(1)).as("n_blocks"))
        .withColumn("n", lit(n))
    }
    perSize.reduce(_ unionByName _)
      .groupBy(col("event_type"))
      .agg(
        regr_slope(log2(col("rs")), log2(col("n").cast("double"))).as("hurst"),
        count(lit(1)).as("n_sizes"))
  }
}
