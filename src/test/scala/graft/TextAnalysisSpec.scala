package graft

import graft.ops.TextAnalysis

/** Repetition-signal contracts: hand-computed duplicate fractions on
  * degenerate (fully repeated) and clean texts.
  */
class TextAnalysisSpec extends SparkSpec {

  test("dedupSpans: repeated spans dropped everywhere, docs reassemble in order") {
    import spark.implicits._
    // span width 3: "a b c" repeats in docs 1 and 2 (dropped from both,
    // wherever it sits); unique spans and the natural-length tail stay
    val docs = Seq(
      (1L, "a b c x y z tail1"),        // spans: [a b c][x y z][tail1]
      (2L, "p q r a b c only"),         // spans: [p q r][a b c][only]
      (3L, "solo words here just four") // spans: [solo words here][just four]
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.dedupSpans(docs, 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) == (("x y z tail1", 3, 1)))
    assert(out(2L) == (("p q r only", 3, 1)))
    assert(out(3L) == (("solo words here just four", 2, 0)))
    // a fully-boilerplate doc collapses to the empty string, not null
    val all = Seq((1L, "dup dup"), (2L, "dup dup")).toDF("doc_id", "text")
    val gone = graft.ops.TextAnalysis.dedupSpans(all, 3).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gone == Map(1L -> "", 2L -> ""))
  }
  import spark.implicits._

  test("repetitionScore: hand-computed fractions for spammy vs clean text") {
    val docs = Seq(
      (0L, "spam spam spam spam", "en", "s", 19L), // 4 toks / 1 uniq; 2 ngrams / 1 uniq
      (1L, "one two three four five", "en", "s", 23L), // all distinct
      (2L, "ab cd", "en", "s", 5L) // < 3 tokens: dropped (no 3-gram exists)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.repetitionScore(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getInt(3), r.getDouble(4))).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L) == ((4, 0.75, 2, 0.5)))
    assert(out(1L) == ((5, 0.0, 3, 0.0)))
  }

  test("bm25: matches a sequential reimplementation; rarer terms weigh more") {
    val docs = Seq(
      (0L, "spark runs fast spark wins", "en", "s", 0L), // spark x2
      (1L, "hash join hash agg hash", "en", "s", 0L), // hash x3
      (2L, "window frame spark window", "en", "s", 0L), // window x2, spark x1
      (3L, "plain prose only here", "en", "s", 0L), // no query term -> absent
      (4L, "spark", "en", "s", 0L) // shortest doc, spark x1
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val terms = Seq("spark", "hash", "window")
    val out = TextAnalysis.bm25(docs, terms).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // sequential oracle with the same constant composition
    val texts = Map(0L -> "spark runs fast spark wins",
      1L -> "hash join hash agg hash",
      2L -> "window frame spark window", 3L -> "plain prose only here",
      4L -> "spark")
    val tokss = texts.view.mapValues(_.split(" ").toSeq).toMap
    val n = texts.size.toDouble
    val avgdl = tokss.values.map(_.length.toLong).sum.toDouble / n
    val df = terms.map(t => t -> tokss.values.count(_.contains(t)).toDouble).toMap
    val (k1, b) = (1.2, 0.75)
    def score(id: Long): (Long, Double) = {
      val tf = terms.map(t => tokss(id).count(_ == t).toLong)
      val dl = tokss(id).length.toDouble
      val s = terms.zip(tf).map { case (t, f) =>
        (n - df(t) + 0.5) / (df(t) + 0.5) * (f.toDouble * (k1 + 1.0)) /
          (f.toDouble + k1 * ((1.0 - b) + b * dl / avgdl))
      }.reduceLeft(_ + _)
      (tf.sum, s)
    }
    assert(out.keySet == Set(0L, 1L, 2L, 4L))
    out.keySet.foreach(id => assert(out(id) == score(id), s"doc $id"))
    // length-normalization sanity: the 1-token doc whose ONLY token is a
    // hit outscores the 5-token doc with two hits — tf saturates (k1)
    // while the short doc's length term shrinks its denominator
    assert(out(4L)._2 > out(0L)._2 && out(0L)._2 > 0.0)
  }
}
