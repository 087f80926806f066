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

  test("bpeEncode: hand-computed per-doc stats under an explicit merge table") {
    // merges: (a,a) then (aa,b) — rank order matters: "aab" encodes as
    // aa b </w> after rank 1, then aab </w> after rank 2 (the rank-2
    // rule consumes rank 1's product); "aaab" -> aa a b </w> -> no
    // rank-2 match (aa is followed by a, not b) -> 4 symbols.
    val merges = Seq((1, "a", "a", 9L), (2, "aa", "b", 9L))
      .toDF("rank", "sym_a", "sym_b", "n")
    val docs = Seq((0L, "aab aaab"), (1L, "aab aab c")).toDF("doc_id", "text")
    val out = Tokenizer.bpeEncode(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 0: aab = [aab, </w>] = 2, aaab = [aa, a, b, </w>] = 4; chars 3+4
    assert(out(0L) == ((2L, 6L, 7L)))
    // doc 1: aab twice (2 each), c = [c, </w>] = 2; chars 3+3+1
    assert(out(1L) == ((3L, 6L, 7L)))
  }

  test("bpeEncode: sentinel merges only by rule; encode of the training corpus matches the train state") {
    // (b, </w>) attaches the sentinel: "ab" -> [a, b</w>] = 2 symbols
    val m = Seq((1, "b", "</w>", 9L)).toDF("rank", "sym_a", "sym_b", "n")
    val one = Tokenizer.bpeEncode(Seq((0L, "ab")).toDF("doc_id", "text"), m)
      .collect()(0)
    assert((one.getLong(1), one.getLong(2), one.getLong(3)) == ((1L, 2L, 2L)))
    // Sennrich fixture: after 6 trained merges the hand state is
    // low -> [low, </w>] (2), lower -> [low, e, r, </w>] (4),
    // newest -> [n, ew, est</w>] (3), widest -> [w, i, d, est</w>] (4)
    val stats = Tokenizer.bpeEncode(fixture, Tokenizer.bpeTrain(fixture, 6))
    val total = stats.agg(sum("n_subwords")).collect()(0).getLong(0)
    assert(total == 5 * 2 + 2 * 4 + 6 * 3 + 3 * 4)
  }

  test("bpeVocab: final-state symbols, mass, and merge provenance on the Sennrich fixture") {
    // after 6 merges: low→[low,</w>]×5, lower→[low,e,r,</w>]×2,
    // newest→[n,ew,est</w>]×6, widest→[w,i,d,est</w>]×3
    val v = Tokenizer.bpeVocab(fixture, Tokenizer.bpeTrain(fixture, 6))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(v("low") == ((7L, true)))       // 5 + 2, product of merge 5
    assert(v("est</w>") == ((9L, true)))   // 6 + 3, product of merge 3
    assert(v("ew") == ((6L, true)))        // product of merge 6
    assert(v("</w>") == ((7L, false)))     // unmerged sentinel: low + lower
    assert(v("e") == ((2L, false)))        // only lower's interior e remains
    assert(v("w") == ((3L, false)))        // only widest's leading w remains
    // every base char is un-merged; every merged symbol is multi-char
    v.foreach { case (s, (_, m)) =>
      if (s.length == 1) assert(!m, s"base char $s flagged merged") }
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
