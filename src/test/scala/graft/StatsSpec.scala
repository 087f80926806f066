package graft

import graft.ops.Stats

/** Histogram binning: hand-computed bins, max-value clamp, degenerate
  * single-value column, partitioning invariance.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("histogram: equi-width bins, max clamps into the last bin") {
    // values 0..10 over [0,10] with 5 bins of width 2:
    // bin 0 ← {0,1}, 1 ← {2,3}, 2 ← {4,5}, 3 ← {6,7}, 4 ← {8,9,10}
    val df = (0 to 10).map(_.toDouble).toDF("v").repartition(4)
    val got = Stats.histogram(df, "v", 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got == Map(
      0L -> ((2L, 0.0, 1.0)), 1L -> ((2L, 2.0, 3.0)), 2L -> ((2L, 4.0, 5.0)),
      3L -> ((2L, 6.0, 7.0)), 4L -> ((3L, 8.0, 10.0))))
  }

  test("histogram: constant column collapses to bin 0, no division by zero") {
    val df = Seq.fill(7)(42.0).toDF("v")
    val got = Stats.histogram(df, "v", 10).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 0L && got(0).getLong(1) == 7L)
  }

  test("summaryShards/mergeSummary: any shard split folds to the direct stats") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val df = (0 until 5000).map(i => (i.toLong, rnd.nextDouble() * 1000.0))
      .toDF("id", "v")
    // direct single-pass reference via Spark's own aggregates
    val ref = df.agg(count(lit(1)), sum($"v"), min($"v"), max($"v"),
      avg($"v"), var_samp($"v"), stddev_samp($"v")).head()
    // three very different shardings must all land on the same summary
    for (shard <- Seq(pmod($"id", lit(7L)), pmod($"id", lit(113L)), lit(0L))) {
      val m = Stats.mergeSummary(Stats.summaryShards(df, "v", shard)).head()
      assert(m.getLong(0) == ref.getLong(0))
      assert(math.abs(m.getDouble(1) - ref.getDouble(1)) < 1e-6)
      assert(m.getDouble(2) == ref.getDouble(2)) // min exact
      assert(m.getDouble(3) == ref.getDouble(3)) // max exact
      assert(math.abs(m.getDouble(4) - ref.getDouble(4)) < 1e-9)
      assert(math.abs(m.getDouble(5) - ref.getDouble(5)) < 1e-6)
      assert(math.abs(m.getDouble(6) - ref.getDouble(6)) < 1e-9)
    }
    // the whole point: merging yesterday's state with today's batch
    // equals recomputing over the union
    val yesterday = Stats.summaryShards(df.filter($"id" < 3000L), "v", lit("y"))
    val today = Stats.summaryShards(df.filter($"id" >= 3000L), "v", lit("t"))
    val merged = Stats.mergeSummary(yesterday.unionByName(today)).head()
    assert(merged.getLong(0) == ref.getLong(0))
    assert(math.abs(merged.getDouble(5) - ref.getDouble(5)) < 1e-6)
    // n = 1 shard: variance is null, not a division error
    val one = Stats.mergeSummary(
      Stats.summaryShards(df.limit(1), "v", lit(0L))).head()
    assert(one.getLong(0) == 1L && one.isNullAt(5))
  }

  test("summaryShardsExact/mergeSummaryExact: BIT-identical across shard splits") {
    import org.apache.spark.sql.functions._
    // cent-grid values (the fixed-point contract of the exact variant)
    val df = (0 until 5000).map(i => (i.toLong, (i * 37 % 99991) / 100.0))
      .toDF("id", "v")
    // decimal accumulation makes every derived double IDENTICAL — not
    // approximately equal — under any shard split or partitioning
    val rows = Seq(pmod($"id", lit(7L)), pmod($"id", lit(113L)), lit(0L))
      .map(shard => Stats.mergeSummaryExact(
        Stats.summaryShardsExact(df.repartition(5), "v", shard)).head())
    val first = rows.head
    rows.tail.foreach { r =>
      (0 until first.length).foreach { i =>
        assert(r.get(i) == first.get(i), s"column $i differs across shardings")
      }
    }
    // and it agrees with the generic double variant within float noise
    val dbl = Stats.mergeSummary(
      Stats.summaryShards(df, "v", pmod($"id", lit(7L)))).head()
    assert(first.getLong(0) == dbl.getLong(0))
    assert(approx(first.getDouble(4), dbl.getDouble(4))) // mean
    assert(approx(first.getDouble(5), dbl.getDouble(5), 1e-6)) // var
  }

  test("winsorize: hand-computed clamp at exact quantiles; nulls stay null") {
    // values 0..10: p25 = 2.5, p75 = 7.5 → 0,1,2 clamp up; 8,9,10 clamp down
    val df = ((0 to 10).map(i => Some(i.toDouble)) :+ None)
      .toDF("v")
    val out = Stats.winsorize(df, "v", 0.25, 0.75)
      .select("v", "winsorized").collect()
      .map(r => Option(r.get(0)) -> Option(r.get(1))).toMap
    assert(out(Some(0.0)) == Some(2.5) && out(Some(2.0)) == Some(2.5))
    assert(out(Some(5.0)) == Some(5.0))
    assert(out(Some(9.0)) == Some(7.5) && out(Some(10.0)) == Some(7.5))
    assert(out(None).isEmpty) // greatest() must not swallow the null
    intercept[IllegalArgumentException] { Stats.winsorize(df, "v", 0.9, 0.1) }
  }

  test("robustScale: (v - median)/IQR hand-computed; constant column scales to 0") {
    // 1,2,3,4,5: med = 3, IQR = 4 - 2 = 2 → scaled = -1, -0.5, 0, 0.5, 1
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v")
    val out = Stats.robustScale(df, "v").select("v", "scaled").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(out == Map(1.0 -> -1.0, 2.0 -> -0.5, 3.0 -> 0.0, 4.0 -> 0.5, 5.0 -> 1.0))
    // degenerate: all values equal → IQR 0 → scaled 0.0, no ANSI div-by-zero
    val const = Seq(7.0, 7.0, 7.0).toDF("v")
    assert(Stats.robustScale(const, "v").select("scaled")
      .as[Double].collect().toSeq == Seq(0.0, 0.0, 0.0))
  }

  test("seasonalityGrid: dow x hour cells, Spark 1=Sunday convention") {
    import java.sql.Timestamp
    // 2024-01-01 is a Monday (dow 2); 2024-01-07 a Sunday (dow 1)
    val e = Seq(
      (0L, Timestamp.valueOf("2024-01-01 10:15:00"), "btc", 4.0),
      (1L, Timestamp.valueOf("2024-01-01 10:45:00"), "btc", 6.0),
      (2L, Timestamp.valueOf("2024-01-07 23:00:00"), "btc", 9.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val out = Stats.seasonalityGrid(e).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(out.size == 2)
    assert(out((2, 10)) == ((5.0, 10.0, 2L)))
    assert(out((1, 23)) == ((9.0, 9.0, 1L)))
  }
}
