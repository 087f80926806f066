package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING support (Sennrich, Haddow &
  * Birch, ACL 2016 — the subword algorithm behind GPT-2/LLaMA-family
  * vocabularies). Training a BPE vocabulary over a 100 TB corpus is a
  * data-engineering problem before it is an algorithms problem, and its
  * data side factors into exactly two relational shapes:
  *
  *   1. ONE pass over token volume — the word-frequency table. BPE
  *      statistics are identical on (word, freq) and on the raw corpus
  *      ([[wordFreqs]]); after this aggregate every training round runs
  *      in word-TYPE space, orders of magnitude below token volume.
  *   2. Per round: an adjacent symbol-pair aggregate weighted by word
  *      freq ([[bpePairStats]] is round 0), an argmax, and a per-word
  *      symbol merge — all map-side-combinable aggregates and pure
  *      per-row array transforms; the only driver traffic is the ONE
  *      argmax row per round.
  *
  * The merge itself ([[mergePair]]) is the canonical left-to-right
  * non-overlapping scan, expressed as a Catalyst `aggregate` fold over
  * the symbol array — no UDF, no serialization boundary. On a run of
  * identical symbols (`a a a a`, merging `(a, a)`) it produces
  * `aa aa`, matching the reference implementation.
  *
  * Reference semantics note: words here are whitespace tokens of the
  * lowercased text (the repo-wide convention); each word ends with the
  * standard `</w>` end-of-word sentinel so merges can't cross word
  * boundaries and final-position symbols stay distinct from interior
  * ones.
  */
object Tokenizer {

  private def toks = split(lower(col("text")), " ")

  /** The corpus word-frequency table: one row per word TYPE. This is the
    * only operation that touches token volume; everything downstream is
    * type-space.
    */
  def wordFreqs(documents: DataFrame): DataFrame =
    documents.select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** `w` → its initial BPE symbol sequence: characters plus the `</w>`
    * sentinel. `split(w, "")` emits one UTF-16 code unit per element
    * with a trailing empty string (filtered); the corpus contract is
    * ASCII/BMP text, where code units == characters.
    */
  private def initialSymbols(w: Column): Column =
    concat(filter(split(w, ""), x => x =!= ""), array(lit("</w>")))

  /** Adjacent symbol pairs of one word's symbol array, as "l r" strings
    * (symbols never contain spaces: they are concatenations of
    * non-space characters and the sentinel).
    */
  private def adjacentPairs(s: Column): Column =
    zip_with(slice(s, lit(1), size(s) - 1), slice(s, lit(2), size(s) - 1),
      (a, b) => concat_ws(" ", a, b))

  /** One canonical left-to-right BPE merge of pair (l, r) in a symbol
    * array, as a Catalyst fold: append each symbol unless it is `r` and
    * the last emitted symbol is `l`, in which case the two collapse to
    * `lr`. A merged token is itself eligible as the LEFT side of the
    * next match (that is what makes `a a a a` → `aa aa`), exactly like
    * the reference scan.
    */
  private[graft] def mergePair(s: Column, l: String, r: String): Column =
    aggregate(s, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Round-0 BPE pair statistics: the top-k adjacent character-pair
    * counts, weighted by word frequency — the first merge decision's
    * input, and the standard corpus diagnostic for "what will this
    * tokenizer learn first". Deterministic total order: count DESC,
    * then (sym_a, sym_b) ASC.
    */
  def bpePairStats(documents: DataFrame, k: Int = 50): DataFrame =
    wordFreqs(documents)
      .select(col("freq"), explode(adjacentPairs(initialSymbols(col("w")))).as("p"))
      .groupBy(col("p"))
      .agg(sum(col("freq")).as("n"))
      .select(split(col("p"), " ").getItem(0).as("sym_a"),
        split(col("p"), " ").getItem(1).as("sym_b"), col("n"))
      .orderBy(col("n").desc, col("sym_a").asc, col("sym_b").asc)
      .limit(k)

  /** Train `nMerges` BPE merge rules. Returns (rank, sym_a, sym_b, n):
    * the rank-ordered merge table a tokenizer ships (rank 1 = first,
    * most frequent, merge).
    *
    * Each round aggregates pair counts over the word-TYPE table, pulls
    * ONE argmax row to the driver (ties → lexicographically smallest
    * pair — deterministic across engines and partitionings), and folds
    * the winning merge through every word's symbol array. Lineage is
    * truncated per round ([[graft.ops.Checkpoints.stable]]) so the plan
    * doesn't deepen with merge count.
    */
  def bpeTrain(documents: DataFrame, nMerges: Int): DataFrame = {
    require(nMerges >= 1 && nMerges <= 1000,
      s"nMerges must be in [1, 1000], got $nMerges")
    val spark = documents.sparkSession
    import spark.implicits._
    var cur = Checkpoints.stable(
      wordFreqs(documents)
        .select(initialSymbols(col("w")).as("s"), col("freq")))
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val top = cur
        .select(col("freq"), explode(adjacentPairs(col("s"))).as("p"))
        .groupBy(col("p")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("p").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val Array(l, r) = top(0).getString(0).split(" ", 2)
        merges += ((rank, l, r, top(0).getLong(1)))
        cur = Checkpoints.stable(
          cur.select(mergePair(col("s"), l, r).as("s"), col("freq")))
        rank += 1
      }
    }
    merges.toSeq.toDF("rank", "sym_a", "sym_b", "n")
  }
}
