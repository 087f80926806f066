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

  /** ENCODE with a trained merge table: per-document token statistics
    * under the ACTUAL tokenizer — `(doc_id, n_words, n_subwords,
    * n_chars)` — the numbers a packing/budgeting stage
    * ([[Packing]], [[Sampling.mixTokenBudget]]) needs, where the
    * regex-proxy count (`token_bpe`) only approximates.
    *
    * Scale shape — token volume is touched exactly TWICE, both
    * embarrassingly parallel:
    *
    *   1. The merge loop runs in word-TYPE space (vocabulary-sized,
    *      orders of magnitude below token volume). Merges apply
    *      SEQUENTIALLY IN RANK ORDER, batched [[mergeBatch]] per
    *      projection with a lineage cut per batch so neither codegen
    *      size nor plan depth grows with the table. Rank order is
    *      exactly priority-order encode for a TRAINED table: a merge's
    *      sides exist only after all strictly-earlier merges (training
    *      consistency), and merging (l, r) → lr creates only pairs that
    *      contain lr — a symbol no earlier rule references — so a pass
    *      at rank k can never re-enable a rank < k match.
    *   2. One corpus pass explodes (doc_id, word) and pre-aggregates to
    *      (doc_id, word, cnt) BEFORE joining the per-type subword
    *      lengths: the join emits exactly one row per input row (no
    *      amplification), so Zipf-head words skew group SIZE only —
    *      AQE's skew split handles that without salting.
    *
    * `n_subwords` counts symbols of the final sequence (an unmerged
    * `</w>` sentinel is its own symbol — the reference convention, where
    * the sentinel merges into the final subword only when a trained rule
    * says so). The merge table is bounded by the [[bpeTrain]] contract
    * (≤ 1000 rows), so the driver collect is O(vocab budget), the
    * [[Ivf]] centroid precedent.
    */
  def bpeEncode(documents: DataFrame, merges: DataFrame): DataFrame = {
    val lens = bpeEncodeTypes(documents, merges)
      .select(col("w"), size(col("s")).cast("long").as("n_sub"))
    documents.select(col("doc_id"), explode(toks).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("cnt"))
      // merge-hinted: lens is vocabulary-sized (grows with the corpus
      // under Heaps' law) and the left side corpus-sized — mis-estimated
      // broadcasts of post-aggregate sides OOM (jaccard_allpairs
      // precedent); AQE still splits any Zipf-head skew
      .join(lens.hint("merge"), "w")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_sub")).as("n_subwords"),
        sum(col("cnt") * length(col("w")).cast("long")).as("n_chars"))
  }

  /** Merges folded per projection before a lineage cut: 8 nested
    * `aggregate` folds stay comfortably inside codegen's method-size
    * budget while keeping the pass count over the type table at
    * ⌈rules/8⌉.
    */
  private val mergeBatch = 8

  /** The type-space half of encoding: every word TYPE's final symbol
    * sequence under the rank-ordered merge table, with its corpus
    * frequency — the shared substrate of [[bpeEncode]] (joins lengths
    * back to documents) and [[bpeVocab]] (aggregates symbol mass).
    * Vocabulary-sized throughout; see [[bpeEncode]] for why sequential
    * rank order is exactly priority-order encode.
    */
  def bpeEncodeTypes(documents: DataFrame, merges: DataFrame): DataFrame = {
    val ms = merges.select(col("rank").cast("int"), col("sym_a"), col("sym_b"))
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2)))
    require(ms.length <= 1000,
      s"merge table carries ${ms.length} rules; the train contract caps at 1000")
    var enc = Checkpoints.stable(
      wordFreqs(documents)
        .select(col("w"), initialSymbols(col("w")).as("s"), col("freq")))
    ms.grouped(mergeBatch).foreach { batch =>
      val folded = batch.foldLeft(col("s")) {
        case (c, (l, r)) => mergePair(c, l, r)
      }
      enc = Checkpoints.stable(
        enc.select(col("w"), folded.as("s"), col("freq")))
    }
    enc
  }

  /** The VOCABULARY a trained tokenizer ships: every symbol of the
    * final encoded state with its corpus occurrence mass and whether a
    * merge rule produced it (base characters and the `</w>` sentinel are
    * the un-merged rest). The usual acceptance check before freezing a
    * tokenizer: merged symbols should carry most of the mass, and a
    * merge whose product barely occurs was wasted vocabulary budget.
    *
    * Shape: one explode of the TYPE table's symbol arrays (vocabulary ×
    * symbols-per-word rows, far below token volume), one hash aggregate,
    * one broadcast membership join against the ≤1000-row merge table.
    */
  def bpeVocab(documents: DataFrame, merges: DataFrame): DataFrame = {
    val merged = merges
      .select(concat(col("sym_a"), col("sym_b")).as("symbol")).distinct()
      .withColumn("m", lit(true))
    bpeEncodeTypes(documents, merges)
      .select(explode(col("s")).as("symbol"), col("freq"))
      .groupBy(col("symbol")).agg(sum(col("freq")).as("n_occurrences"))
      .join(broadcast(merged), Seq("symbol"), "left")
      .select(col("symbol"), col("n_occurrences"),
        coalesce(col("m"), lit(false)).as("is_merged"))
  }
}
