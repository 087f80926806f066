package graft

import graft.ops.TextAnalysis

/** Repetition-signal contracts: hand-computed duplicate fractions on
  * degenerate (fully repeated) and clean texts.
  */
class TextAnalysisSpec extends SparkSpec {
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
}
