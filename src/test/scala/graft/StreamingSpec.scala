package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Resample
import graft.stream.StreamingResample

/** Streaming parity (SURVEY §5.2.5): the Structured Streaming resample
  * replayed from a file source must equal the batch result on the same
  * input.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly OHLC equals batch ohlcHourly on replay") {
    val rnd = new scala.util.Random(3)
    val events = (0 until 3000).map { i =>
      (i.toLong, new Timestamp(1704067200000L + i * 7000L),
        if (i % 2 == 0) "btc" else "eth", 100.0 + rnd.nextGaussian())
    }.toDF("event_id", "ts", "event_type", "value")

    val dir = Files.createTempDirectory("graft_stream_").toString
    events.write.mode("overwrite").parquet(s"$dir/in")

    val streamDf = StreamingResample.hourlyOhlc(
      spark, s"$dir/in", events.schema)
    val q = streamDf.writeStream
      .format("memory")
      .queryName("stream_ohlc")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("stream_ohlc")
      .orderBy("bucket", "event_type").collect()
    val batch = Resample.ohlcHourly(events)
      .orderBy("bucket", "event_type").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("checkpointed file sink: stop/restart resumes exactly-once across the boundary") {
    // Two runs of the SAME query over one checkpoint: run 1 sees hours
    // 0–4.5, run 2 sees the rest plus a far-future sentinel that pushes
    // the watermark past every real window. The [4,5) window receives
    // rows from BOTH runs, so correct output requires the restart to
    // recover run 1's aggregation state; equality with the batch result
    // (no missing and no duplicated windows) is the exactly-once proof.
    val rnd = new scala.util.Random(29)
    val all = (0 until 3600).map { i => // 10 s cadence, 10 hours, 2 symbols
      (i.toLong, new Timestamp(1704067200000L + i * 10000L),
        if (i % 2 == 0) "btc" else "eth", 100.0 + rnd.nextGaussian())
    }
    val (phase1, phase2) = all.splitAt(1620) // boundary mid-hour at 4.5 h
    val sentinel = Seq((99999L,
      new Timestamp(1704067200000L + 50L * 3600000L), "btc", 1.0))
    val dir = Files.createTempDirectory("graft_ckpt_").toString

    def runOnce(): Unit = {
      val q = StreamingResample.hourlyOhlc(spark, s"$dir/in",
          phase1.toDF("event_id", "ts", "event_type", "value").schema)
        .writeStream
        .format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append") // file sink: only watermark-finalized windows
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(!q.isActive)
    }

    phase1.toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/in")
    runOnce() // run 1: emits only windows already below the watermark
    (phase2 ++ sentinel).toDF("event_id", "ts", "event_type", "value")
      .write.mode("append").parquet(s"$dir/in")
    runOnce() // run 2: same checkpoint — resumes, finalizes the rest

    val sink = spark.read.parquet(s"$dir/out")
      .filter(col("bucket") < 1704067200L + 40L * 3600L) // drop sentinel window if present
      .orderBy("bucket", "event_type").collect()
    val batch = Resample.ohlcHourly(
        all.toDF("event_id", "ts", "event_type", "value"))
      .orderBy("bucket", "event_type").collect()
    assert(sink.length == batch.length && sink.length == 20)
    sink.zip(batch).foreach { case (s, b) =>
      assert(s.getAs[Long]("bucket") == b.getAs[Long]("bucket"))
      assert(s.getAs[String]("event_type") == b.getAs[String]("event_type"))
      assert(s.getAs[Double]("open") == b.getAs[Double]("open"))
      assert(s.getAs[Double]("high") == b.getAs[Double]("high"))
      assert(s.getAs[Double]("low") == b.getAs[Double]("low"))
      assert(s.getAs[Double]("close") == b.getAs[Double]("close"))
      assert(approx(s.getAs[Double]("volume"), b.getAs[Double]("volume")))
      assert(s.getAs[Long]("n_trades") == b.getAs[Long]("n_trades"))
    }
  }

  test("sliding windows: every event lands in exactly 4 windows") {
    val events = (0 until 500).map { i =>
      (i.toLong, new Timestamp(1704067200000L + i * 60000L), "btc", 1.0)
    }.toDF("event_id", "ts", "event_type", "value")
    val dir = Files.createTempDirectory("graft_slide_").toString
    events.write.mode("overwrite").parquet(s"$dir/in")
    val q = StreamingResample.slidingVolume(spark, s"$dir/in", events.schema)
      .writeStream.format("memory").queryName("slide_t")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val total = spark.table("slide_t").agg(sum("n")).as[Long].head()
    assert(total == 500L * 4) // 1h window / 15min slide = 4 windows each
  }

  test("mapGroupsWithState running stats equal the batch oracle on replay") {
    val rnd = new scala.util.Random(21)
    val events = (0 until 2000).map { i =>
      (i.toLong, new Timestamp(1704067200000L + i * 5000L),
        Seq("btc", "eth", "sol")(i % 3), 50.0 + rnd.nextGaussian() * 5)
    }.toDF("event_id", "ts", "event_type", "value")
    val dir = Files.createTempDirectory("graft_state_").toString
    events.write.mode("overwrite").parquet(s"$dir/in")
    val q = graft.stream.StatefulRunning.runningStats(spark, s"$dir/in", events.schema)
      .writeStream.format("memory").queryName("state_t")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // update mode may emit a row per batch per key; keep the final row
    val streamed = spark.table("state_t")
      .groupBy("event_type")
      .agg(max("n").as("n"), max("total_volume").as("total_volume"),
        max("high").as("high"), min("low").as("low"))
      .orderBy("event_type").collect()
    val batch = graft.stream.StatefulRunning.runningStatsBatch(events)
      .select("event_type", "n", "total_volume", "high", "low")
      .orderBy("event_type").collect()
    assert(streamed.length == 3)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getAs[String]("event_type") == b.getAs[String]("event_type"))
      assert(s.getAs[Long]("n") == b.getAs[Long]("n"))
      assert(approx(s.getAs[Double]("total_volume"), b.getAs[Double]("total_volume")))
      assert(s.getAs[Double]("high") == b.getAs[Double]("high"))
      assert(s.getAs[Double]("low") == b.getAs[Double]("low"))
    }
  }

  test("streaming dedup: replayed event ids emit exactly once") {
    // at-least-once upstream: every 5th event is delivered twice, some
    // three times, across separate files (≈ separate micro-batches)
    val base = (0 until 1000).map { i =>
      (i.toLong, new Timestamp(1704067200000L + i * 5000L), "btc", i * 1.0)
    }
    val replays = base.filter(_._1 % 5 == 0) ++ base.filter(_._1 % 50 == 0)
    val dir = Files.createTempDirectory("graft_dedup_").toString
    base.toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/in")
    replays.toDF("event_id", "ts", "event_type", "value")
      .write.mode("append").parquet(s"$dir/in")
    val q = StreamingResample.dedupEvents(spark, s"$dir/in",
        base.toDF("event_id", "ts", "event_type", "value").schema)
      .writeStream.format("memory").queryName("dedup_t")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("dedup_t").select("event_id").as[Long].collect()
    assert(out.length == 1000)               // every id exactly once
    assert(out.toSet == (0L until 1000L).toSet)
  }

  test("session windows: gap splits sessions at the fixture boundary") {
    // two bursts separated by 30 min, gap 5 min -> exactly 2 sessions
    val burst1 = (0 until 10).map(i => (i.toLong,
      new Timestamp(1704067200000L + i * 60000L), "btc", 1.0))
    val burst2 = (0 until 7).map(i => (100L + i,
      new Timestamp(1704067200000L + 40 * 60000L + i * 60000L), "btc", 1.0))
    val events = (burst1 ++ burst2).toDF("event_id", "ts", "event_type", "value")
    val dir = Files.createTempDirectory("graft_sess_").toString
    events.write.mode("overwrite").parquet(s"$dir/in")
    val q = StreamingResample.sessionCounts(spark, s"$dir/in", events.schema, "5 minutes")
      .writeStream.format("memory").queryName("sess_t")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val sessions = spark.table("sess_t").orderBy("s_start").collect()
    assert(sessions.length == 2)
    assert(sessions(0).getAs[Long]("n") == 10L)
    assert(sessions(1).getAs[Long]("n") == 7L)
  }
}
