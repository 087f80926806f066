package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.Layout

/** Z-order layout: interleave arithmetic and the locality it buys —
  * a 2-D box query's rows concentrate in few files of the clustered
  * layout but smear across all files of a row-ordered one.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: known bit patterns land at i*n+d positions") {
    // x=0b101, y=0b011, 3 bits, 2 dims:
    // z = x0<<0 | y0<<1 | x1<<2 | y1<<3 | x2<<4 | y2<<5
    //   = 1 | 2 | 0 | 8 | 16 | 0 = 27
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.interleave(Seq(col("x"), col("y")), 3).as("z"))
      .head.getLong(0)
    assert(got == 27L)
    // single dimension degenerates to the identity (bits permitting)
    val id = Seq((173L, 0L)).toDF("x", "y")
      .select(Layout.interleave(Seq(col("x")), 8).as("z")).head.getLong(0)
    assert(id == 173L)
  }

  test("interleave rejects bits * dims > 63 (would shift past long width)") {
    val e = intercept[IllegalArgumentException] {
      Layout.interleave(Seq(col("x"), col("y")), 32)
    }
    assert(e.getMessage.contains("63"))
    // the boundary itself is fine: 3 dims x 21 bits = 63
    Layout.interleave(Seq(col("x"), col("y"), col("z")), 21)
  }

  test("z-ordered layout concentrates a box query; row-ordered smears it") {
    // 100k points uniform on [0,1)^2, hash-derived (deterministic)
    val pts = spark.range(100000L).select(
      col("id"),
      (pmod(xxhash64(col("id") * 31L), lit(100000L)) / 100000.0).as("x"),
      (pmod(xxhash64(col("id") * 37L), lit(100000L)) / 100000.0).as("y"))
    val base = Files.createTempDirectory("graft_zorder_").toString
    Layout.writeZOrdered(pts, Seq("x", "y"), bits = 8, nFiles = 64, dir = s"$base/z")
    pts.repartition(64).write.parquet(s"$base/rows") // the unclustered control

    def filesTouched(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
      val total = df.select(input_file_name()).distinct().count()
      val touched = df
        .filter(col("x").between(0.4, 0.5) && col("y").between(0.2, 0.3))
        .select(input_file_name()).distinct().count()
      (touched, total)
    }
    val (zTouched, zTotal) = filesTouched(s"$base/z")
    val (rTouched, rTotal) = filesTouched(s"$base/rows")
    // identical answers either way — layout changes locality, not results
    val zCount = spark.read.parquet(s"$base/z")
      .filter(col("x").between(0.4, 0.5) && col("y").between(0.2, 0.3)).count()
    val rCount = spark.read.parquet(s"$base/rows")
      .filter(col("x").between(0.4, 0.5) && col("y").between(0.2, 0.3)).count()
    assert(zCount == rCount && zCount > 500)
    // ~1% box: a handful of z-files vs essentially every row-ordered file
    assert(zTouched * 4 <= zTotal,
      s"z-order should prune: touched $zTouched of $zTotal")
    assert(rTouched * 2 >= rTotal,
      s"control should smear: touched $rTouched of $rTotal")
    assert(zTouched < rTouched)
  }
}
