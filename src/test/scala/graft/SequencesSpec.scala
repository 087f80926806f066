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

  test("slidingSequences: timestamp ties resolve by event_id, deterministically") {
    // Sub-second components that collide at whole-second granularity
    // (1.200s vs 1.700s vs 1.200s) plus exact-µs duplicates — the cases
    // the (ts, event_id) total order and the unix_micros (non-truncating)
    // path exist for. Values encode the expected order.
    val rows = Seq(
      (0L, new Timestamp(1704067200200L), "a", 1.0), // 0.200s
      (1L, new Timestamp(1704067200700L), "a", 2.0), // 0.700s — same second as id 0
      (2L, new Timestamp(1704067201200L), "a", 3.0),
      (3L, new Timestamp(1704067201200L), "a", 4.0), // exact-µs tie with id 2
      (4L, new Timestamp(1704067202000L), "a", 5.0),
      (5L, new Timestamp(1704067202000L), "a", 6.0)  // exact-µs tie with id 4
    ).toDF("event_id", "ts", "event_type", "value")
    val expectedSeqs = Map( // (ts, event_id) total order = values 1..6
      0L -> Seq(1.0), 1L -> Seq(1.0, 2.0), 2L -> Seq(1.0, 2.0, 3.0),
      3L -> Seq(2.0, 3.0, 4.0), 4L -> Seq(3.0, 4.0, 5.0))
    for (_ <- 1 to 3) { // repeated runs: determinism, not luck
      val w = Sequences.slidingSequences(rows.repartition(5), 3)
        .orderBy("event_id").collect()
      assert(w.map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
      w.foreach(r => assert(r.getSeq[Double](2) == expectedSeqs(r.getLong(0))))
      val m = Sequences.slidingSequencesScale(rows.repartition(5), 3)
        .orderBy("event_id").collect()
      assert(w.map(_.toSeq.toList).toList == m.map(_.toSeq.toList).toList)
    }
  }

  test("rankMetrics: ties share rank, dense_rank stays dense, rationals exact") {
    val orders = Seq(
      (1L, 1L, 500.0, "P1"), (2L, 1L, 500.0, "P1"), // price tie → rank tie? no: key tie-break
      (3L, 1L, 400.0, "P1"), (4L, 1L, 300.0, "P1"),
      (5L, 2L, 900.0, "P2"), (6L, 2L, 100.0, "P2")
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    val out = graft.ops.Sequences.rankMetrics(orders, 3).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getInt(3), r.getInt(4), r.getDouble(5), r.getDouble(6))).toMap
    // the (price desc, key asc) order is total: no true ties survive, so
    // rank == dense_rank == row position
    assert(out(("P1", 1L)) == ((1, 1, 0.0, 0.25)))
    assert(out(("P1", 2L)) == ((2, 2, 1.0 / 3.0, 0.5)))
    assert(out(("P1", 3L)) == ((3, 3, 2.0 / 3.0, 0.75)))
    assert(out(("P2", 5L)) == ((1, 1, 0.0, 0.5)))
    assert(!out.contains(("P1", 4L))) // k=3 cut
  }

  test("slidingSequencesChunked: identical to the window form across chunk boundaries") {
    val rnd = new scala.util.Random(19)
    // two symbols of very different depth + irregular time gaps (the
    // count-chunking must not care about time), tiny chunkRows so nearly
    // every sequence straddles a boundary
    val big = ((0 until 997).map { i =>
      (i.toLong, new Timestamp(1704067200000L + i * 1000L + (i % 13) * 90000L),
        "deep", rnd.nextDouble() * 100)
    } ++ (0 until 23).map { i =>
      (5000L + i, new Timestamp(1704067200000L + i * 3600000L), "shallow",
        rnd.nextDouble() * 10)
    }).toDF("event_id", "ts", "event_type", "value")
    for (chunkRows <- Seq(7, 64, 100000)) {
      val w = Sequences.slidingSequences(big, 7).orderBy("event_id").collect()
      val c = Sequences.slidingSequencesChunked(big.repartition(5), 7, chunkRows)
        .orderBy("event_id").collect()
      assert(w.length == c.length && w.length > 0, s"chunkRows=$chunkRows")
      w.zip(c).foreach { case (a, b) =>
        assert(a.getLong(0) == b.getLong(0), s"chunkRows=$chunkRows")
        assert(a.getSeq[Double](2) == b.getSeq[Double](2),
          s"chunkRows=$chunkRows @ ${a.getLong(0)}")
        assert(a.getDouble(3) == b.getDouble(3), s"chunkRows=$chunkRows")
      }
    }
  }

  test("flattenSeq: element columns match the array, no array column left") {
    val out = Sequences.flattenSeq(Sequences.slidingSequences(events, 3), 3)
      .orderBy("event_id").collect()
    assert(out.length == 2)
    assert(!out(0).schema.fieldNames.contains("seq"))
    assert(out(0).getDouble(2) == 10000.0 && out(0).getDouble(3) == 10050.0 &&
      out(0).getDouble(4) == 10100.0 && out(0).getDouble(5) == 10150.0)
    assert(out(1).getDouble(2) == 10050.0 && out(1).getDouble(4) == 10150.0 &&
      out(1).getDouble(5) == 10200.0)
  }

  test("tailN: returns the latest n per type in original order") {
    val out = Sequences.tailN(events, 2).orderBy("ts_us").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 4L))
  }
}
