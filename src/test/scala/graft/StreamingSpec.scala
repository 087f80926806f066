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
}
