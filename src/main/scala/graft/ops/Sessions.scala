package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the batch twin of the streaming session
  * window (`stream/StreamingResample.scala`): consecutive events of the
  * same user separated by more than `gapSeconds` start a new session.
  *
  * The reference has no session concept (its events carry no actor), but
  * any behavioral/training-data pipeline over an event log needs this —
  * it's the canonical "flag + running sum" window composition:
  *
  *   1. `lag(ts)` per user → gap to the previous event,
  *   2. `new_sess = gap IS NULL OR gap > threshold` (0/1 flag),
  *   3. `session_idx = sum(new_sess)` over the running per-user frame,
  *   4. groupBy (user, session_idx) → one row per session.
  *
  * Scale: both windows partition by `user_id` — one shuffle on the user
  * key, every user's timeline scanned linearly and independently, no
  * global ordering anywhere. At 100 TB the user key is high-cardinality
  * (millions of users × bounded per-user history), so the work spreads
  * evenly across executors; a single pathological user degrades to one
  * large-but-linear task rather than poisoning the whole stage.
  * Arithmetic stays in long microseconds end-to-end — the session
  * boundary test is exact integer comparison, never float.
  */
object Sessions {

  /** One row per (user, session): bounds, size, duration, value total.
    * Ties at the same microsecond break on `event_id` so the session
    * assignment is total-order deterministic under any partitioning.
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("event_id").asc)
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("t_us"))
      .withColumn("prev_us", lag(col("t_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("t_us") - col("prev_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(running))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("t_us")).as("start_us"),
        max(col("t_us")).as("end_us"),
        (max(col("t_us")) - min(col("t_us"))).as("dur_us"),
        sum(col("value")).as("sum_value"))
  }
}
