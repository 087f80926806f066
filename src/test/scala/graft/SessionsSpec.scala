package graft

import java.sql.Timestamp

import graft.ops.Sessions

/** Gap sessionization: boundary semantics (gap strictly greater than the
  * threshold starts a new session), per-user independence, aggregates.
  */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1704067200000L // 2024-01-01 00:00:00 UTC, millis

  test("sessionize: splits on gap > threshold, exact-gap stays joined") {
    val rows = Seq(
      // user 1: events at 0s, 10s, 1810s (gap 1800 == threshold: SAME
      // session), 3611s (gap 1801 > threshold: new session)
      (0L, new Timestamp(T0), 1L, 1.0),
      (1L, new Timestamp(T0 + 10000L), 1L, 2.0),
      (2L, new Timestamp(T0 + 1810000L), 1L, 4.0),
      (3L, new Timestamp(T0 + 3611000L), 1L, 8.0),
      // user 2: one event — one singleton session
      (4L, new Timestamp(T0 + 500L), 2L, 16.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val out = Sessions.sessionize(rows, gapSeconds = 1800L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    assert(out.size == 3)
    val t0us = T0 * 1000L
    assert(out((1L, 1L)) ==
      ((3L, t0us, t0us + 1810000000L, 1810000000L, 7.0)))
    assert(out((1L, 2L)) ==
      ((1L, t0us + 3611000000L, t0us + 3611000000L, 0L, 8.0)))
    assert(out((2L, 1L)) == ((1L, t0us + 500000L, t0us + 500000L, 0L, 16.0)))
  }

  test("sessionize: agrees with Spark's native session_window on real data") {
    import org.apache.spark.sql.functions._
    // independent formulation cross-check: the lag/running-sum spelling
    // must produce the same sessions as groupBy(session_window). The two
    // differ only on gaps EXACTLY equal to the threshold (ours merges,
    // session_window splits) — assert the corpus has none, so the
    // comparison is exact and stays exact (fixed test data).
    val ev = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val exactBoundary = ev
      .withColumn("gap", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
      .filter(col("gap") === 1800L * 1000000L).count()
    assert(exactBoundary == 0L, "corpus has an exact-threshold gap; pick another gap")
    val ours = Sessions.sessionize(ev, 1800L)
      .select("user_id", "n_events", "start_us", "end_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
    val native = ev
      .groupBy(session_window(col("ts"), "1800 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
      .select("user_id", "n_events", "start_us", "end_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
    assert(ours == native)
  }

  test("sessionize: same-microsecond ties break on event_id deterministically") {
    // two events at the identical instant then a far one: tie order can't
    // change session COUNTS, and output is stable across partitionings
    val rows = Seq(
      (7L, new Timestamp(T0), 1L, 1.0),
      (3L, new Timestamp(T0), 1L, 2.0),
      (9L, new Timestamp(T0 + 10000000L), 1L, 4.0)
    ).toDF("event_id", "ts", "user_id", "value")
    for (parts <- Seq(1, 5)) {
      val out = Sessions.sessionize(rows.repartition(parts), 1800L)
        .orderBy("session_idx").collect()
      assert(out.length == 2)
      assert(out(0).getLong(2) == 2L && out(0).getDouble(6) == 3.0)
      assert(out(1).getLong(2) == 1L && out(1).getDouble(6) == 4.0)
    }
  }
}
