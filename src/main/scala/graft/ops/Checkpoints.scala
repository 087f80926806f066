package graft.ops

import org.apache.spark.sql.DataFrame

/** Materialization barrier for iterative and multiply-consumed plans.
  *
  * Spark does NOT share common sub-plans across DataFrame branches: a
  * frame consumed by two downstream operators recomputes its whole DAG
  * twice, and an iterative loop's lineage deepens every round. Both the
  * connected-components loop ([[Clustering]]) and the SemDeDup family
  * ([[Ivf]]) need an explicit cut.
  *
  * Two cuts exist, selected by session state:
  *
  *  - **Reliable** (`df.checkpoint()`), used when the session has a
  *    checkpoint directory configured
  *    (`spark.sparkContext.setCheckpointDir(...)`): blocks persist to
  *    the (typically fault-tolerant) checkpoint filesystem and SURVIVE
  *    EXECUTOR LOSS — the property a multi-hour iterative job on a real
  *    cluster needs, where "usually no executor dies mid-loop" is not a
  *    plan. This is the 100 TB configuration.
  *  - **Local** (`df.localCheckpoint()`), the fallback: blocks pin to
  *    executor storage. Fast (no filesystem round-trip) but a lost
  *    executor kills the lineage and the job. Acceptable for local
  *    bench/test runs on a single JVM, where executor loss IS process
  *    death anyway.
  *
  * The checkpoint-dir presence is the flag — idiomatic Spark (it is
  * exactly how Structured Streaming and GraphX select reliability), so
  * a deployment opts into the reliable path with one standard call and
  * no graft-specific configuration.
  */
object Checkpoints {

  /** Materialize `df` eagerly and truncate its lineage; reliable iff a
    * checkpoint dir is configured (see object doc).
    */
  def stable(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()

  /** Drop the materialized blocks behind a [[stable]] cut NOW, without
    * waiting for ContextCleaner GC. The governance paths need this: a
    * [[CandidateMassExceeded]] refusal abandons its eagerly-built cut,
    * and on a long-lived session repeated refusals would otherwise pin
    * executor storage until the driver-side references are collected.
    * No-op on frames that are not cuts (no LogicalRDD leaves) and on
    * reliable (checkpoint-dir) cuts, whose files the cleaner owns.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
