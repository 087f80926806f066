package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types.StructType

/** Streaming per-group Count–Min sketch: the d×w counter matrix carried
  * as `mapGroupsWithState` state, folding each micro-batch's tokens and
  * emitting the current probe-term estimates per group per batch — the
  * live-corpus twin of [[graft.ops.TextAnalysis.cmsProfile]], and the
  * point-query complement to [[StreamingTopK]]'s Misra–Gries state the
  * same way the batch forms complement each other.
  *
  * State is O(d·w) per group REGARDLESS of stream length or vocabulary,
  * and counter increments commute, so the micro-batch fold order cannot
  * change the final matrix: after any replay-free prefix the streamed
  * counters equal a batch fold of the same rows. The bucket arithmetic
  * (md5 of "row:token" → first 15 hex chars → BIGINT mod w) is exactly
  * [[graft.ops.TextAnalysis.cmsProfile]]'s, so streamed estimates are
  * comparable with the batch operator's, and the one-sided guarantee
  * (estimate ≥ true count, overestimate ≤ εN with probability 1−δ)
  * holds over the whole stream prefix at every emission.
  *
  * No watermark: sketches never expire (add a timeout where group churn
  * demands reclamation).
  */
object StreamingCms {

  case class TokenRow(group: String, t: String)
  case class CmsState(counters: Seq[Long], n: Long)
  case class CmsOut(group: String, n_tokens: Long,
                    terms: Seq[String], estimates: Seq[Long])

  /** The cmsProfile bucket arithmetic, sequential form: one MessageDigest
    * per caller, reused across tokens (digest() resets after each call).
    */
  private[graft] def bucketFn(w: Int): (String, Int) => Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (t, j) => {
      val hex = md.digest(s"$j:$t".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % w).toInt
    }
  }

  private def update(probe: Seq[String], d: Int, w: Int)(
      key: String, rows: Iterator[TokenRow],
      state: GroupState[CmsState]): CmsOut = {
    val bucket = bucketFn(w)
    val cur = state.getOption.getOrElse(CmsState(Vector.fill(d * w)(0L), 0L))
    val counters = cur.counters.toArray
    var n = cur.n
    rows.foreach { r =>
      var j = 0
      while (j < d) { counters(j * w + bucket(r.t, j)) += 1L; j += 1 }
      n += 1L
    }
    state.update(CmsState(counters.toVector, n))
    val ests = probe.map { t =>
      (0 until d).map(j => counters(j * w + bucket(t, j))).min }
    CmsOut(key, n, probe, ests)
  }

  /** Streaming per-language CMS probe estimates from a parquet landing
    * dir of document batches (doc_id, lang, text, ...). Output mode
    * `update`: one row per touched language per micro-batch.
    */
  def cmsProbe(spark: SparkSession, inputDir: String, schema: StructType,
               probe: Seq[String], d: Int = 4, w: Int = 64,
               maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputDir)
      .select(col("lang").as("group"),
        explode(split(lower(col("text")), " ")).as("t"))
      .as[TokenRow]
      .groupByKey(_.group)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        update(probe, d, w))
      .toDF()
  }

  /** Sequential batch fold with the same bucket arithmetic — what the
    * stream's final emission must equal exactly (counter increments
    * commute, so batching order is irrelevant).
    */
  def cmsProbeBatch(docs: Seq[(String, String)], probe: Seq[String],
                    d: Int = 4, w: Int = 64): Map[String, (Long, Seq[Long])] = {
    val bucket = bucketFn(w)
    docs.groupBy(_._1).map { case (group, rows) =>
      val counters = new Array[Long](d * w)
      var n = 0L
      rows.foreach { case (_, text) =>
        // split(" ", -1) + Locale.ROOT: Java's 1-arg split drops TRAILING
        // empty tokens and default-locale lowercasing is env-dependent;
        // the streaming query uses Spark's split/lower, which keep them —
        // the "final emission equals the batch fold" contract needs the
        // reference fold to tokenize identically.
        text.toLowerCase(java.util.Locale.ROOT).split(" ", -1).foreach { t =>
          var j = 0
          while (j < d) { counters(j * w + bucket(t, j)) += 1L; j += 1 }
          n += 1L
        }
      }
      group -> (n, probe.map { t =>
        (0 until d).map(j => counters(j * w + bucket(t, j))).min })
    }
  }
}
