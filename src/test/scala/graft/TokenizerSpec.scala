package graft

import org.apache.spark.sql.functions._

import graft.ops.Tokenizer

/** BPE training contracts, pinned against the hand-computed merge
  * sequence of the classic Sennrich et al. (ACL 2016) fixture
  * {low×5, lower×2, newest×6, widest×3}.
  */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  // one document carrying each word at its fixture frequency — wordFreqs
  // aggregates across the corpus, so the carrier layout is irrelevant
  private def fixture = {
    val words =
      List.fill(5)("low") ++ List.fill(2)("lower") ++
        List.fill(6)("newest") ++ List.fill(3)("widest")
    Seq((0L, words.take(8).mkString(" ")), (1L, words.drop(8).mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("mergePair: canonical left-to-right scan, merged token re-eligible on the left") {
    val out = Seq(
      (Seq("a", "a", "a", "a"), 1), // -> aa aa (NOT aa a a)
      (Seq("a", "a", "a"), 2),      // -> aa a
      (Seq("x", "a", "a", "y"), 3), // -> x aa y
      (Seq("a", "b", "b"), 4)       // merging (a,b): -> ab b (ab != a)
    ).toDF("s", "id")
      .select(col("id"), Tokenizer.mergePair(col("s"), "a", "a").as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(out(1) == Seq("aa", "aa"))
    assert(out(2) == Seq("aa", "a"))
    assert(out(3) == Seq("x", "aa", "y"))
    assert(out(4) == Seq("a", "b", "b"))
    val ab = Seq((Seq("a", "b", "b"), 1)).toDF("s", "id")
      .select(Tokenizer.mergePair(col("s"), "a", "b")).collect()(0).getSeq[String](0)
    assert(ab == Seq("ab", "b"))
  }

  test("bpePairStats: round-0 counts and total order on the Sennrich fixture") {
    val top = Tokenizer.bpePairStats(fixture, 5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // hand-computed round-0 maxima: (e,s) (s,t) (t,</w>) all 9, then
    // (w,e) 8, then the 7s led by (l,o)
    assert(top.take(3).toSeq == Seq(("e", "s", 9L), ("s", "t", 9L), ("t", "</w>", 9L)))
    assert(top(3) == (("w", "e", 8L)))
    assert(top(4) == (("l", "o", 7L)))
  }

  test("bpeTrain: the hand-computed first six merges of the Sennrich fixture") {
    val merges = Tokenizer.bpeTrain(fixture, 6).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(merges == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", "</w>", 9L),
      (4, "l", "o", 7L),
      (5, "lo", "w", 7L),
      (6, "e", "w", 6L)))
  }
}
