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
}
