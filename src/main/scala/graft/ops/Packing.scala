package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the standard pretraining layout:
  * documents are concatenated in a deterministic pseudo-random order and
  * cut into fixed token-budget chunks (documents may straddle a cut; the
  * trainer masks across boundaries).
  *
  * Scale shape: a single global concat order would be one prefix-sum
  * window task, so the corpus is SHARDED by a hash nibble first — each
  * shard packs independently and in parallel, which is exactly how a
  * distributed packing job lays out its output files (one chunk stream
  * per shard). The order/shard hash is md5, so any engine reproduces the
  * identical layout (the DuckDB oracle verifies every (doc → shard,
  * chunk, offset) assignment; for more shards at larger scale, widen the
  * nibble — 2 hex chars = 256 shards).
  */
object Packing {

  /** The chunk budget's unit — how a document's token count is measured.
    * `Whitespace` is the cheap split count; `Bpe` is the BPE-ish
    * pre-tokenization from [[TextAnalysis.tokenBpe]] (letter runs / digit
    * runs / single symbols over lowercased text) — the count a real
    * subword budget tracks, still pure codegen regex and still
    * engine-agnostic (the oracle recomputes it with
    * `regexp_extract_all`).
    */
  sealed trait Tokenizer
  case object Whitespace extends Tokenizer
  case object Bpe extends Tokenizer

  /** Assign every document a (shard, chunk_id, offset) under a
    * `tokensPerChunk` budget measured by `tokenizer`.
    *
    * `shardNibbles` controls parallelism: 16^nibbles shard streams, each
    * an independent prefix-sum window. 1 nibble (16 shards) suits the
    * test corpus; at real scale size it so each shard's token stream
    * fits one task comfortably (2 → 256, 3 → 4096 shards). The oracle is
    * the same substring of the same md5 at any width.
    */
  def packDocs(documents: DataFrame, tokensPerChunk: Int,
               shardNibbles: Int = 1,
               tokenizer: Tokenizer = Whitespace): DataFrame = {
    require(tokensPerChunk > 0)
    require(shardNibbles >= 1 && shardNibbles <= 8,
      s"shardNibbles ($shardNibbles) must be in [1, 8]")
    val nTokens = tokenizer match {
      case Whitespace => size(split(col("text"), " ")).cast("long")
      case Bpe => size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")
    }
    val w = Window.partitionBy(col("shard")).orderBy(col("h"))
    documents
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("shard", substring(col("h"), 1, shardNibbles))
      .withColumn("n_tokens", nTokens)
      .withColumn("start_tok", coalesce(
        sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("chunk_id", floor(col("start_tok") / tokensPerChunk))
      .withColumn("offset", col("start_tok") % tokensPerChunk)
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("chunk_id"), col("offset"))
  }
}
