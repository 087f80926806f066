package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-capture tool for the optimization rounds: for each named query,
  * writes `plans/<tag dir>/<query>_<tag>.txt` containing the
  * `.explain("formatted")` output and — because AQE re-plans at runtime
  * (join-strategy changes, coalesced reads, reused exchanges only appear
  * in the final plan) — the executed-plan tree after one full `noop`
  * materialization of the query.
  *
  * Usage: `sbt 'runMain graft.Plans <query> [<query> ...]'` with
  * `SPARK_GRAFT_PLANS_DIR` (default `plans/r18`) and
  * `SPARK_GRAFT_PLANS_TAG` (default `before`) in the environment.
  * Measurement is not the point here — run it solo anyway so any bench
  * running elsewhere is not perturbed.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r18")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLANS_TAG", "before")
    require(args.nonEmpty, "usage: runMain graft.Plans <query> [<query> ...]")
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val spark = GraftSession.localBuilder(cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    args.foreach { n =>
      spark.sparkContext.setJobDescription(s"plans:$n")
      val df = SparkEntry.queries(n)(spark, sfDir)
      val formatted = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      // materialize THIS QueryExecution (a `.write` would spawn its own)
      // so the printed tree is the AQE-final plan with runtime
      // ReusedExchange / coalesced-read info — the PlanShapeSpec idiom
      df.collect()
      val executed = df.queryExecution.executedPlan.toString
      val txt = s"== explain(formatted) ==\n$formatted\n\n== AQE-final executedPlan ==\n$executed\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plans] wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
