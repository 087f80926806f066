package graft

import java.sql.Timestamp

import graft.ops.Sequences

/** The reference's sequence-generation fixture
  * (`model_utils.py:149-177`): 5 prices, seq_length 3 → 2 (X, y) pairs.
  */
class SequencesSpec extends SparkSpec {
  import spark.implicits._

  private val prices = Seq(10000.0, 10050.0, 10100.0, 10150.0, 10200.0)

  private def events = prices.zipWithIndex.map { case (v, i) =>
    (i.toLong, new Timestamp(1704067200000L + i * 1000L), "btc", v)
  }.toDF("event_id", "ts", "event_type", "value")

  test("slidingSequences: 5 points, n=3 yields the reference's 2 sequences") {
    val out = Sequences.slidingSequences(events, 3).orderBy("event_id").collect()
    assert(out.length == 2)
    assert(out(0).getSeq[Double](2) == Seq(10000.0, 10050.0, 10100.0))
    assert(out(0).getDouble(3) == 10150.0)
    assert(out(1).getSeq[Double](2) == Seq(10050.0, 10100.0, 10150.0))
    assert(out(1).getDouble(3) == 10200.0)
  }

  test("slidingSequencesScale: element-identical to the window form") {
    val rnd = new scala.util.Random(11)
    val big = (0 until 2000).map { i =>
      (i.toLong, new Timestamp(1704067200000L + i * 1000L),
        if (i % 3 == 0) "a" else "b", rnd.nextDouble() * 100)
    }.toDF("event_id", "ts", "event_type", "value")
    val w = Sequences.slidingSequences(big, 7).orderBy("event_id").collect()
    val m = Sequences.slidingSequencesScale(big, 7).orderBy("event_id").collect()
    assert(w.length == m.length && w.length > 0)
    w.zip(m).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getSeq[Double](2) == b.getSeq[Double](2))
      assert(a.getDouble(3) == b.getDouble(3))
    }
  }

  test("tailN: returns the latest n per type in original order") {
    val out = Sequences.tailN(events, 2).orderBy("ts_us").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 4L))
  }
}
