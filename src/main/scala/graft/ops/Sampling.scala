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
}
