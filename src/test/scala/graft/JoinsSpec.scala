package graft

import java.sql.Timestamp

import graft.ops.Joins

/** As-of join parity: the chunked form must reproduce the per-symbol
  * carry-forward exactly, including bar-less chunks (state inherited
  * through gaps) and events at chunk-start instants.
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("rangeJoin: inclusive start, exclusive end, key isolation") {
    val left = Seq(
      ("btc", 100L, 1L), ("btc", 150L, 2L), ("btc", 199L, 3L),
      ("btc", 200L, 4L),             // == end: excluded
      ("btc", 99L, 5L),              // < start: excluded
      ("eth", 150L, 6L)              // other key: excluded
    ).toDF("k", "t", "row_id")
    val right = Seq(("btc", 100L, 200L, 7L)).toDF("rk", "w_start", "w_end", "w_id")
    for (w <- Seq(50L, 100L, 1000L)) {
      val got = graft.ops.Joins
        .rangeJoin(left, "k", "t", right, "rk", "w_start", "w_end", w)
        .select("row_id").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == Seq(1L, 2L, 3L), s"bucket=$w")
    }
  }

  test("rangeJoin: matches the naive theta join on random overlapping intervals") {
    val rnd = new scala.util.Random(41)
    val left = (0 until 2000).map(i =>
      (if (i % 2 == 0) "a" else "b", rnd.nextLong(100000L), i.toLong))
      .toDF("k", "t", "row_id").repartition(7)
    val right = (0 until 80).map { j =>
      val s = rnd.nextLong(95000L)
      (if (j % 2 == 0) "a" else "b", s, s + 1 + rnd.nextLong(8000L), j.toLong)
    }.toDF("rk", "w_start", "w_end", "w_id").repartition(3)
    val naive = left.join(right,
      left("k") === right("rk") &&
        left("t") >= right("w_start") && left("t") < right("w_end"))
      .select("row_id", "w_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // bucket width ≥ max interval length (8001) and a much larger one
    for (w <- Seq(8192L, 100000L)) {
      val got = graft.ops.Joins
        .rangeJoin(left, "k", "t", right, "rk", "w_start", "w_end", w)
        .select("row_id", "w_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == naive, s"bucket=$w")
    }
  }

  test("rangeJoin: empty/inverted intervals produce zero rows, not a bucket blowup") {
    val left = Seq(("btc", 150L, 1L)).toDF("k", "t", "row_id")
    // end == start (empty) and end < start by 10^9 (inverted): without the
    // pre-explode filter, sequence() would enumerate DOWNWARD through ~10^6
    // buckets for the inverted row. The guard drops both before exploding.
    val right = Seq(
      ("btc", 100L, 100L, 7L),
      ("btc", 1000000000L, 0L, 8L)
    ).toDF("rk", "w_start", "w_end", "w_id")
    val got = graft.ops.Joins
      .rangeJoin(left, "k", "t", right, "rk", "w_start", "w_end", 1000L)
    assert(got.count() == 0)
  }

  test("asofJoinGeneric rejects payloadCols that collide with or are missing from inputs") {
    val left = Seq((1L, 10L, 2.0)).toDF("k", "t", "px")
    val right = Seq((1L, 5L, 3.0)).toDF("k", "qt", "px")
    val clash = intercept[IllegalArgumentException] {
      Joins.asofJoinGeneric(left, right, Seq("k"), "t", "qt", Seq("px"))
    }
    assert(clash.getMessage.contains("collide"))
    val missing = intercept[IllegalArgumentException] {
      Joins.asofJoinGeneric(left, right, Seq("k"), "t", "qt", Seq("nope"))
    }
    assert(missing.getMessage.contains("not found"))
  }

  test("asofJoinGeneric: backward/forward parity with the specialized forms; multi-key isolation") {
    val rnd = new scala.util.Random(53)
    val rows = (0 until 3000).map { i =>
      (i.toLong, new Timestamp(1704067200000L + i * 47000L),
        if (i % 2 == 0) "btc" else "eth", 100.0 + rnd.nextGaussian())
    }.toDF("event_id", "ts", "event_type", "value").repartition(5)

    val barsB = graft.ops.Resample.ohlcHourlyTs(rows)
      .select($"event_type", $"bucket_end", $"close")
    val genB = Joins.asofJoinGeneric(rows, barsB,
        Seq("event_type"), "ts", "bucket_end", Seq("close"))
      .select($"event_id", $"close".as("bar_close"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val specB = Joins.asofJoin(rows)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(genB == specB)

    val barsF = graft.ops.Resample.ohlcHourlyTs(rows)
      .select($"event_type", $"bucket_ts", $"open")
    val genF = Joins.asofJoinGeneric(rows, barsF,
        Seq("event_type"), "ts", "bucket_ts", Seq("open"), forward = true)
      .select($"event_id", $"open")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val specF = Joins.asofJoinForward(rows)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(genF == specF)

    // composite keys: quotes must never leak across (sym, venue)
    val trades = Seq(
      (1L, 100L, "btc", "A", 1.0), (2L, 100L, "btc", "B", 2.0),
      (3L, 300L, "eth", "A", 3.0)
    ).toDF("trade_id", "t", "sym", "venue", "qty")
    val quotes = Seq(
      ("btc", "A", 90L, 10.5), ("btc", "B", 95L, 11.5),
      ("eth", "A", 250L, 20.5), ("eth", "B", 10L, 99.9)
    ).toDF("sym", "venue", "qt", "px")
    val got = Joins.asofJoinGeneric(trades, quotes,
        Seq("sym", "venue"), "t", "qt", Seq("px"))
      .collect().map(r => r.getAs[Long]("trade_id") -> r.getAs[Double]("px")).toMap
    assert(got == Map(1L -> 10.5, 2L -> 11.5, 3L -> 20.5))
  }

  test("asofJoinChunked: identical to asofJoin across chunk boundaries and gaps") {
    val rnd = new scala.util.Random(23)
    // bursty series: active hours separated by multi-hour silences, so
    // some 2-hour chunks contain no bars at all; events land exactly on
    // chunk boundaries too (i * 7200 s hits every chunk start)
    val rows = (0 until 4000).map { i =>
      val burst = i / 400                     // 10 bursts
      val ts = 1704067200000L + burst * 10L * 3600000L + (i % 400) * 9000L
      (i.toLong, new Timestamp(ts), if (i % 2 == 0) "btc" else "eth",
        100.0 + rnd.nextGaussian())
    }
    val df = rows.toDF("event_id", "ts", "event_type", "value").repartition(7)
    val plain = Joins.asofJoin(df).orderBy("event_id").collect()
    for (chunkMicros <- Seq(2L * 3600L * 1000000L, 7200L * 1000000L * 12L)) {
      val chunked = Joins.asofJoinChunked(df, chunkMicros)
        .orderBy("event_id").collect()
      assert(plain.length == chunked.length && plain.length == 4000)
      plain.zip(chunked).foreach { case (a, b) =>
        assert(a.toSeq == b.toSeq, s"chunk=$chunkMicros @ ${a.getLong(0)}")
      }
    }
  }

  test("asofJoinForward: next bar's open, inclusive at the bar-start instant") {
    // two symbols, 30-min spacing → hourly bars open at :00; the event
    // AT a bar start must take that bar's open (inclusive >=), events
    // after the last bar start still match it, nothing looks backward
    val rows = Seq(
      (0L, new Timestamp(1704067200000L), "btc", 10.0), // 00:00 — bar0 open
      (1L, new Timestamp(1704069000000L), "btc", 11.0), // 00:30
      (2L, new Timestamp(1704070800000L), "btc", 12.0), // 01:00 — bar1 open
      (3L, new Timestamp(1704072600000L), "btc", 13.0), // 01:30
      (4L, new Timestamp(1704067200000L), "eth", 20.0)  // 00:00 — eth bar open
    ).toDF("event_id", "ts", "event_type", "value")
    val out = graft.ops.Joins.asofJoinForward(rows).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(0L) == Some(10.0)) // its own bar's open (inclusive)
    assert(out(1L) == Some(12.0)) // next bar opens 01:00 with value 12
    assert(out(2L) == Some(12.0))
    assert(out(3L) == None) // nothing opens at or after 01:30 — left join null
    assert(out(4L) == Some(20.0))
  }

  test("asofJoinForwardChunked: identical to asofJoinForward across chunk boundaries and gaps") {
    val rnd = new scala.util.Random(31)
    // same bursty shape as the backward parity test: silent chunks (no
    // bars), events exactly on chunk boundaries, trailing events past the
    // last bar (null carries must survive chunking in BOTH directions)
    val rows = (0 until 4000).map { i =>
      val burst = i / 400
      val ts = 1704067200000L + burst * 10L * 3600000L + (i % 400) * 9000L
      (i.toLong, new Timestamp(ts), if (i % 2 == 0) "btc" else "eth",
        100.0 + rnd.nextGaussian())
    }
    val df = rows.toDF("event_id", "ts", "event_type", "value").repartition(7)
    val plain = Joins.asofJoinForward(df).orderBy("event_id").collect()
    for (chunkMicros <- Seq(2L * 3600L * 1000000L, 7200L * 1000000L * 12L)) {
      val chunked = Joins.asofJoinForwardChunked(df, chunkMicros)
        .orderBy("event_id").collect()
      assert(plain.length == chunked.length && plain.length == 4000)
      plain.zip(chunked).foreach { case (a, b) =>
        assert(a.toSeq == b.toSeq, s"chunk=$chunkMicros @ ${a.getLong(0)}")
      }
    }
  }
}
