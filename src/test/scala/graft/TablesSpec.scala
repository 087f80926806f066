package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.io.Tables

/** `Tables.events` must adapt to both `ts` encodings the testdata generator
  * has shipped: TIMESTAMP(NANOS) — unreadable natively by Spark 4, surfaced
  * as a long via the legacy nanosAsLong conf — and plain TIMESTAMP_MICROS
  * (TIMESTAMP_NTZ to Spark). Round 8 hard-coded the nanos branch and every
  * events query broke when the generator switched to micros; this pins both
  * paths on local fixtures so neither encoding can regress silently again.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val confKey = "spark.sql.legacy.parquet.nanosAsLong"

  private def fixtureRow(tsCol: org.apache.spark.sql.Column) =
    Seq((1L, 1718000000123456L, 10L, "view", 1.5, """{"k":"v"}"""))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), tsCol.as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))

  test("events: micros/NTZ encoding reads directly, no conf left behind") {
    val dir = Files.createTempDirectory("events_ntz").toString
    // timestamp_micros gives TimestampType; strip the zone label so the file
    // is written as isAdjustedToUTC=false micros — the regenerated testdata.
    fixtureRow(expr("to_timestamp_ntz(timestamp_micros(us))"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    spark.conf.unset(confKey)

    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros(col("ts"))).head().getLong(0) ==
      1718000000123456L)
    // getOption surfaces the registered default ("false"), so "restored"
    // means back to the pre-call value — NOT left flipped to "true".
    assert(spark.conf.get(confKey) == "false",
      "micros path must restore the session conf")
  }

  test("events: long-surfaced nanos encoding converts to µs timestamps") {
    val dir = Files.createTempDirectory("events_ns").toString
    // Spark can't WRITE parquet TIMESTAMP(NANOS); a plain int64 column is
    // exactly what the nanosAsLong conf surfaces the old encoding as, so it
    // exercises the same LongType branch of the reader.
    fixtureRow((col("us") * 1000L).cast(LongType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros(col("ts"))).head().getLong(0) ==
      1718000000123456L)
  }

  test("events: ts predicates push through the NTZ cast to the parquet scan") {
    // The micros path relabels ts via cast(TIMESTAMP_NTZ → TIMESTAMP); under
    // a UTC session Catalyst rewrites comparisons to NTZ literals and pushes
    // them into the scan. At 100 TB a ts range filter that is NOT in
    // PushedFilters re-reads every row group — pin it.
    //
    // Pushdown is only POSSIBLE under the micros encoding: the nanos
    // encoding surfaces ts as a long and derives the timestamp via
    // timestamp_micros(ts div 1000), which no scan predicate can cross.
    // The generator has shipped both encodings (it switched between
    // rounds 7 and 8), so detect what the CURRENT testdata uses the same
    // way Tables.events does and only assert pushdown when it can exist —
    // under nanos, assert the conversion path filters correctly instead.
    val confPrev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, "true")
    val rawIsLong = try {
      spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .schema("ts").dataType == LongType
    } finally confPrev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None    => spark.conf.unset(confKey)
    }

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val filtered = ev
      .filter(col("ts") >= lit("2025-01-01 00:00:00").cast(TimestampType))
      .select("event_id", "ts", "value")
    if (!rawIsLong) {
      val p = filtered.queryExecution.executedPlan.toString
      assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"), p)
    } else {
      // nanos fixture path: the reader adapts but cannot push the
      // predicate — pin the SEMANTICS (no row below the bound survives)
      assert(filtered.filter(col("ts") < lit("2025-01-01 00:00:00")
        .cast(TimestampType)).count() == 0L)
    }
  }

  test("events: real testdata reads and the ts column is usable") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    // the exact shape round 8 died on: date_trunc + comparison over ts
    val n = ev.filter(col("ts") >= lit("2000-01-01").cast(TimestampType))
      .select(date_trunc("hour", col("ts"))).limit(5).count()
    assert(n > 0)
  }
}
