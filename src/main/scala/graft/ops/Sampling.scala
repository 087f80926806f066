package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data curation.
  *
  * Random `df.sample` is useless for corpus work at scale: re-running the
  * pipeline must select the SAME subset (cache keys, incremental
  * processing, A/B-stable eval splits), and the choice must not depend on
  * partitioning or row order. Content-hash sampling gives all of that:
  * a row is selected iff a hash of its key falls under the rate
  * threshold — a pure codegen'd map, no shuffle, no state, and any engine
  * with md5 agrees bit-for-bit (which is how the DuckDB oracle verifies
  * the exact selected row set, not just its size).
  *
  * The hash is md5 (not xxhash64) deliberately: md5 exists in Spark,
  * DuckDB, Python, and practically everything else, so the sample is
  * reproducible across the whole toolchain, not just inside Spark.
  */
object Sampling {

  /** First 8 hex chars of md5 compare uniformly over [0, 2^32): a
    * lexicographic `< threshold` test selects ≈ `rate` of rows,
    * deterministically per key.
    */
  private def hexThreshold(rate: Double): String = {
    require(rate > 0.0 && rate <= 1.0, s"rate $rate outside (0, 1]")
    f"${math.min((rate * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  private def hashBucket(keyCol: String) =
    substring(md5(col(keyCol).cast("string")), 1, 8)

  /** Uniform deterministic sample: keep a row iff
    * `md5(key)[0,8) < threshold(rate)`. Same subset on every run, every
    * partitioning, every engine.
    */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(hashBucket(keyCol) < lit(hexThreshold(rate)))

  /** Stratified deterministic sample: per-stratum rates (e.g. downsample
    * dominant languages, keep the tail whole) — the corpus-rebalancing
    * step of every training-data pipeline. Unknown strata are dropped
    * unless `defaultRate` says otherwise.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, stratumCol: String,
                           rates: Map[String, Double],
                           defaultRate: Double = 0.0): DataFrame = {
    val base: org.apache.spark.sql.Column =
      lit(if (defaultRate <= 0.0) "00000000" else hexThreshold(defaultRate))
    val threshold = rates.foldLeft(base) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit(hexThreshold(rate))).otherwise(acc)
    }
    df.filter(hashBucket(keyCol) < threshold)
  }

  /** Leakage-free train/val/test split (the GroupShuffleSplit shape): the
    * fold is a pure function of the GROUP key's hash, so every row of a
    * group (all orders of a customer, all chunks of a document, all pages
    * of a domain) lands in the same fold — the split hygiene that keeps
    * near-duplicates of a training row out of the eval set. Pure map (one
    * codegen'd md5 + two hex compares), no shuffle, deterministic per key
    * across runs, partitionings, and engines — the same threshold idiom
    * as [[hashSample]], so the fold assignment is fully oracle-able.
    */
  def splitByGroup(df: DataFrame, groupCol: String,
                   valFrac: Double = 0.1, testFrac: Double = 0.1): DataFrame = {
    require(valFrac >= 0.0 && testFrac >= 0.0 && valFrac + testFrac < 1.0,
      s"fractions val=$valFrac test=$testFrac must be ≥ 0 and sum below 1")
    val b = hashBucket(groupCol)
    df.withColumn("split",
      when(b < lit(hexThreshold(1.0 - valFrac - testFrac)), lit("train"))
        .when(b < lit(hexThreshold(1.0 - testFrac)), lit("val"))
        .otherwise(lit("test")))
  }

  /** The hex fold thresholds [[splitByGroup]] compares against — exposed
    * so the oracle SQL can inline the identical literals.
    */
  def splitThresholds(valFrac: Double = 0.1,
                      testFrac: Double = 0.1): (String, String) =
    (hexThreshold(1.0 - valFrac - testFrac), hexThreshold(1.0 - testFrac))

  /** Per-stratum cap, best first — the source-balancing curation step
    * ("no single domain dominates the mix"): keep at most `k` rows per
    * stratum, highest score first, exact ties to the lowest id. One
    * shuffle on the stratum key; each window partition holds one
    * stratum's rows, so the sort is bounded by the largest stratum — if
    * one stratum is a large fraction of the corpus, cap it in two stages
    * (hash-prefilter to ~k·oversample, then this exact pass) rather than
    * sorting the giant partition.
    */
  def capPerStratum(df: DataFrame, stratumCol: String, scoreCol: String,
                    idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Exactly-k deterministic sample: the k smallest hash values — uniform
    * without replacement, reproducible, and planned as
    * TakeOrderedAndProject (per-partition heaps + driver merge of k, no
    * global sort).
    */
  def hashSampleExact(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.orderBy(md5(col(keyCol).cast("string")), col(keyCol)).limit(k)

  /** Weight-biased exactly-k sample (deterministic priority sampling):
    * priority = hash_uniform(key) / weight, keep the k LOWEST priorities —
    * a doubled weight halves a row's expected rank, so selection
    * probability grows with weight, yet the draw stays content-hash
    * reproducible (same subset every run / partitioning / engine).
    * This is the curation move "prefer long/high-quality docs without
    * giving up determinism".
    *
    * The priority is one exact IEEE division of two engine-agnostic
    * numbers (the md5-prefix uint32 and the stored weight), so the DuckDB
    * oracle reproduces the selected SET bit-for-bit — deliberately NOT
    * the `u^(1/w)` / `-ln(u)/w` textbook forms, whose `pow`/`ln` are not
    * cross-engine exact. Plans as TakeOrderedAndProject: per-partition
    * top-k heaps, no global sort, no shuffle of non-winners.
    */
  def weightedSampleExact(df: DataFrame, keyCol: String, weightCol: String,
                          k: Int): DataFrame =
    df.filter(col(weightCol) > 0) // zero-weight rows can't divide or win
      .withColumn("priority",
        conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
          .cast("double") / col(weightCol).cast("double"))
      .orderBy(col("priority").asc, col(keyCol).asc)
      .limit(k)

  /** Token-budget mixture sampling — the data-MIXING step of a training
    * corpus ("this much of each source"): per stratum, take docs in
    * md5(key) order until the cumulative weight (token count) fills that
    * stratum's budget. Because the running sum is monotone (weights must
    * be non-negative), `cum <= budget` selects a deterministic PREFIX of
    * the hash order — the same docs every run, partitioning, and engine,
    * and adding documents to the corpus never evicts an already-selected
    * one that still fits (hash-order stability).
    *
    * Scale shape: one shuffle on the stratum key; the running sum is a
    * rows-frame window bounded by the largest stratum. The output carries
    * `cum_tokens` so the budget arithmetic itself is part of the oracle
    * contract, not just the selected set.
    */
  def budgetPerStratum(df: DataFrame, stratumCol: String, keyCol: String,
                       weightCol: String, budgets: Map[String, Long],
                       defaultBudget: Long = 0L): DataFrame = {
    require(budgets.values.forall(_ >= 0L) && defaultBudget >= 0L,
      "budgets must be non-negative")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (stratum, b)) =>
        when(col(stratumCol) === stratum, lit(b)).otherwise(acc)
    }
    df.filter(col(weightCol) >= 0) // a negative weight would break the prefix
      .withColumn("cum_tokens", sum(col(weightCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Deterministic shuffle-and-shard — the training-data WRITER's layout:
    * a global hash shuffle of the corpus into `nShards` shards with a
    * stable position inside each shard, so every run (and every engine)
    * writes byte-identical training order. shard = uint32(md5 prefix) mod
    * nShards; pos = 0-based rank by (hash, key) within the shard.
    *
    * Scale shape: the shard id is a pure codegen'd map; the only shuffle
    * is the per-shard window, and each sort is bounded by ~N/nShards rows
    * — pick nShards ≥ executor count and no single task sees more than
    * one shard's slice. No global total order is ever materialized.
    */
  def shuffleShard(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val hashed = df
      .withColumn("_h", substring(md5(col(keyCol).cast("string")), 1, 8))
      .withColumn("shard",
        (conv(col("_h"), 16, 10).cast("long") % nShards).cast("int"))
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col(keyCol))
    hashed
      .withColumn("pos", (row_number().over(w) - 1).cast("int"))
      .drop("_h")
  }

  /** Proportional quality filter — keep the top `fraction` of each
    * stratum by score (ties to the lowest id): the "top 30% per
    * language" curation knob, where [[capPerStratum]]'s fixed k would
    * over-prune big strata and under-prune small ones. The cut is
    * `rank <= ceil(n_stratum * fraction)` — integer rank against one
    * IEEE multiply, so every engine draws the line on the same row.
    *
    * Scale shape: one shuffle on the stratum key; rank and the stratum
    * count ride the SAME window partition (no second aggregate-and-join
    * pass over the corpus). Sort bounded by the largest stratum — same
    * giant-stratum guidance as [[capPerStratum]].
    */
  def topFractionPerStratum(df: DataFrame, stratumCol: String,
                            scoreCol: String, idCol: String,
                            fraction: Double): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction $fraction outside (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val byScore = Window.partitionBy(col(stratumCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val whole = Window.partitionBy(col(stratumCol))
    df.withColumn("_rn", row_number().over(byScore))
      .withColumn("_n", count(lit(1)).over(whole))
      .filter(col("_rn") <= ceil(col("_n") * lit(fraction)))
      .drop("_rn", "_n")
  }

  /** Temperature-based mixture sampling (the multilingual/multi-source
    * rebalancing recipe from mBERT/XLM-R/mT5: sample source s with
    * probability ∝ (its token share)^α, α < 1 flattening the mix so
    * low-resource sources are up-weighted). Where [[budgetPerStratum]]
    * takes explicit per-source budgets, this DERIVES them from measured
    * token mass: budget_s = totalBudget · n_s^α / Σ_t n_t^α, then fills
    * each budget with the same deterministic hash-order prefix.
    *
    * Engine-exactness — every step either integer or exact-rounded:
    * α is restricted to {1, 0.5, 0.25} so n^α is repeated IEEE sqrt
    * (exact-rounded, bit-identical everywhere; arbitrary pow is NOT);
    * shares quantize to Qs = ⌊n^α · 2^20⌋ BIGINT; the budget split is
    * DECIMAL(38,0) products with one integer floor division — no float
    * sum across strata anywhere, so the boundary doc of every source is
    * the same in any engine. Largest-remainder correction is deliberately
    * omitted: budgets are floors, Σ budgets ≤ totalBudget (documented
    * contract; a token-exact fill is [[budgetPerStratum]]'s job).
    *
    * Scale shape: one map-side-combined aggregate for the masses (rows =
    * #strata, broadcast back), then [[budgetPerStratum]]'s window — one
    * shuffle on the stratum key, sort bounded by the largest stratum.
    */
  def mixTemperature(df: DataFrame, stratumCol: String, keyCol: String,
                     weightCol: String, totalBudget: Long,
                     alpha: Double = 0.5): DataFrame = {
    require(totalBudget >= 0L, s"totalBudget must be non-negative")
    require(Set(1.0, 0.5, 0.25).contains(alpha),
      s"alpha must be one of {1, 0.5, 0.25} (exact-rounded sqrt chain), got $alpha")
    import org.apache.spark.sql.expressions.Window
    val pow = (c: org.apache.spark.sql.Column) => alpha match {
      case 1.0 => c
      case 0.5 => sqrt(c)
      case _ => sqrt(sqrt(c))
    }
    val masses = df.filter(col(weightCol) >= 0)
      .groupBy(col(stratumCol).as("_stratum"))
      .agg(sum(col(weightCol)).cast("long").as("_n"))
      .withColumn("_q", floor(pow(col("_n").cast("double")) * lit(1048576.0))
        .cast("long"))
    val denom = masses.agg(sum(col("_q")).as("_denom"))
    val budgets = masses.crossJoin(broadcast(denom))
      .withColumn("_budget",
        expr(s"(cast(_q as decimal(38,0)) * cast($totalBudget as decimal(38,0)))" +
          " div cast(_denom as decimal(38,0))").cast("long"))
      .select(col("_stratum"), col("_budget"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(weightCol) >= 0)
      .join(broadcast(budgets), col(stratumCol) === col("_stratum"))
      .withColumn("cum_tokens", sum(col(weightCol)).over(w))
      .filter(col("cum_tokens") <= col("_budget"))
      .withColumn("budget", col("_budget"))
      .drop("_stratum", "_budget")
  }
}
