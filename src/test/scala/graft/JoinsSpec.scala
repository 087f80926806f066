package graft

import java.sql.Timestamp

import graft.ops.Joins

/** As-of join parity: the chunked form must reproduce the per-symbol
  * carry-forward exactly, including bar-less chunks (state inherited
  * through gaps) and events at chunk-start instants.
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

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
}
