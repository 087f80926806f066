package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types.StructType

import graft.agg.MisraGriesAgg

/** Streaming per-group heavy hitters: a Misra–Gries summary carried as
  * `mapGroupsWithState` state, folding each micro-batch's tokens into the
  * bounded buffer and emitting the current top-k estimates per group per
  * batch — the live-corpus twin of [[graft.ops.TextAnalysis.heavyHitters]].
  *
  * State is O(m) per group REGARDLESS of stream length or vocabulary —
  * the property that makes per-key top-k viable on an unbounded token
  * stream, where exact per-term counts would grow state without bound.
  * The MG bounds hold over the whole stream prefix (estimate ≤ true;
  * true − estimate ≤ N/(m+1) with N the group's tokens so far), and the
  * fold order imposed by micro-batching is just one of the orderings the
  * sketch is already invariant-bounded under.
  *
  * No watermark: summaries never expire (add `GroupStateTimeout` where
  * group churn demands reclamation).
  */
object StreamingTopK {

  case class TokenRow(group: String, t: String)
  case class TopKState(summary: Map[String, Long], n: Long)
  case class TopKOut(group: String, n_tokens: Long,
                     terms: Seq[String], estimates: Seq[Long])

  private def update(agg: MisraGriesAgg, k: Int)(
      key: String, rows: Iterator[TokenRow],
      state: GroupState[TopKState]): TopKOut = {
    var s = state.getOption.getOrElse(TopKState(Map.empty, 0L))
    rows.foreach { r =>
      s = TopKState(agg.reduce(s.summary, r.t), s.n + 1L)
    }
    state.update(s)
    val top = s.summary.toSeq
      .sortBy { case (t, est) => (-est, t) }
      .take(k)
    TopKOut(key, s.n, top.map(_._1), top.map(_._2))
  }

  /** Streaming per-language unigram top-k from a parquet landing dir of
    * document batches (doc_id, lang, text, ...). Output mode `update`:
    * one row per touched language per micro-batch.
    */
  def topTokens(spark: SparkSession, inputDir: String, schema: StructType,
                m: Int = 1024, k: Int = 5,
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
        update(new MisraGriesAgg(m), k))
      .toDF()
  }

  /** Batch oracle: exact per-group top-k token counts — what the stream's
    * final emission must equal whenever the group vocabulary fits the
    * sketch capacity (estimates are then exact counts).
    */
  def topTokensBatch(documents: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = documents
      .select(col("lang").as("group"),
        explode(split(lower(col("text")), " ")).as("t"))
      .groupBy(col("group"), col("t"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("group"))
      .orderBy(col("cnt").desc, col("t").asc)
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("group"), col("rank"), col("t"), col("cnt"))
  }
}
