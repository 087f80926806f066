package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry.queries entry, fully
  * materialized via the `noop` datasource (exercises the real plan —
  * unlike `.count()`, which lets Catalyst prune all non-key columns).
  * Failed queries report -1 s so a broken query can never masquerade as a
  * fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: benign WARN spam (WindowExec, AQE) once pushed the
    // final JSON line out of the driver's capture window.
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the JVM (codegen, parquet reader, shuffle paths) on the
    // flagship query so the first timed entry doesn't absorb JIT cost.
    try SparkEntry.queries("ohlc_hourly")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // ms precision keeps the one-line JSON short enough that a byte-bounded
    // tail capture can't truncate it (17-digit doubles once did).
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
