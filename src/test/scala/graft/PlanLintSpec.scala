package graft

import org.apache.spark.sql.execution.{CollectLimitExec, FileSourceScanExec, FilterExec, GlobalLimitExec, InputAdapter, LocalTableScanExec, SparkPlan, TakeOrderedAndProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.catalyst.expressions.{BinaryComparison, Literal}
import org.apache.spark.sql.catalyst.optimizer.BuildLeft
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

/** Automatic plan lint over EVERY registered query: the hand-picked
  * guards in PlanShapeSpec cover ~20% of the surface; this sweep pins
  * the three scale-killer plan properties for all of it, so a refactor
  * can't silently regress a query the named guards don't cover.
  *
  * Rules, per query, on the AQE-less physical plan at sf0.001 (plan
  * SHAPE is under test, not data volume):
  *
  *   1. no CartesianProduct ever, and no BroadcastNestedLoopJoin except
  *      the whitelisted 1-row/bounded-broadcast patterns (a scalar
  *      bounds row or a single query vector riding a broadcast into a
  *      map-side projection is the CORRECT plan — the broadcast side is
  *      provably tiny, so "nested loop" degenerates to a map);
  *   2. no single-partition funnel: a Window/WindowGroupLimit with an
  *      empty partitionSpec, or a SinglePartition shuffle feeding
  *      anything except a final scalar aggregate or a limit, serializes
  *      the corpus through one task at 100 TB;
  *   3. pruned ReadSchema: a scan of a base table that reads EVERY
  *      column means pruning broke — only whitelisted whole-row
  *      operators (row dedup, full-document emitters) may.
  *
  * Whitelists are explicit and per-query with the reason inline; adding
  * an entry is a reviewed design decision, not a lint mute.
  */
class PlanLintSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries allowed a BroadcastNestedLoopJoin — every entry's broadcast
    * side must be 1-row or bounded by construction.
    */
  private val allowBnlj: Map[String, String] = Map(
    "ann_md5" -> "1-row query vector broadcast; NLJ degenerates to a scored map over the corpus",
    "ann_quantized" -> "1-row query vector broadcast (int8 candidate pass + exact rerank)",
    "ann_ivf_md5" -> "1-row query vector broadcast against cells / seed assignment",
    "cosine_topk" -> "1-row query vector broadcast (brute-force baseline)",
    "bm25_score" -> "1-row corpus stats (N, avgdl) broadcast",
    "histogram_price" -> "1-row min/max bounds broadcast into the codegen bin map",
    "kl_drift" -> "1-row distribution totals broadcast",
    "unigram_logprob" -> "1-row corpus token total broadcast",
    "bigram_logprob" -> "1-row corpus token total broadcast",
    "dsir_weights" -> "1-row feature-total normalizers broadcast",
    "salient_terms" -> "1-row corpus totals broadcast",
    "distinctive_terms" -> "1-row corpus totals broadcast",
    "winsorize_price" -> "1-row shared percentile-bounds artifact broadcast",
    "robust_scale" -> "1-row shared percentile-bounds artifact broadcast",
    "length_buckets" -> "1-row shared percentile-bounds artifact broadcast",
    "quality_tiers" -> "1-row shared percentile-bounds artifact broadcast",
    "ngram_jaccard" -> "bounded brute-force oracle baseline: <=500 docs by construction feeds the theta self-join",
    "containment_pairs" -> "bounded brute-force baseline: <=500 docs by construction feeds the theta self-join",
    "semantic_dedup" -> "nlist-row centroid table broadcast into the cell-assignment map (same pattern as ann_ivf_md5)",
    "semantic_governed" -> "the semantic_dedup plan behind the governed router's exact arm (the budget clears at lint scale): same nlist-row centroid broadcast",
    "semantic_preflight" -> "nlist-row centroid table broadcast into the cell-assignment map (the semantic_dedup assignment, stopped at the pair-mass aggregate)",
    "ann_pq" -> "1-row query vector broadcast into the exact-cosine re-rank of the bounded ADC candidate set",
    "ann_ivfpq" -> "1-row query vector broadcast (coarse route + ADC + rerank; every broadcast side is 1-row or seed-bounded)",
    "ann_batch" -> "query-set broadcast (n/97 rows) into the scored map; labeled brute baseline, ANN candidate routes are the production path",
    "dedup_ensemble" -> "bounded ngram_jaccard baseline (<=500 docs) feeds the theta self-join; embedding joins are equi-joins",
    "semantic_dedup_hier" -> "coarse-cell centroid broadcast (bounded by `coarse`) into the level-1 assignment map",
    "semantic_dedup_capped" -> "coarse-cell centroid broadcast (bounded by `coarse`) into the level-1 assignment map",
    "semantic_clusters" -> "nlist-row centroid table broadcast into the cell-assignment map (same pattern as semantic_dedup)",
    "pmi_pairs" -> "1-row bigram grand total broadcast",
    "mix_temperature" -> "1-row Qs-denominator aggregate broadcast into the per-stratum budget map",
    "cosine_allpairs" -> "1-row corpus doc-count broadcast into the idf map",
    "vocab_growth" -> "1-row (lo, hi) doc_id bounds broadcast into the codegen bucket map",
    "data_card" -> "1-row estimated_pair_mass scalar (cosine preflight aggregate + the idf doc-count row) broadcast onto the per-source card rows",
    "neardup_governed_incremental" -> "1-row id-split bounds broadcast selecting the batch ids for the larger-id-is-new semi join (the minhash_incremental split, visible here because the exact arm's final plan carries it)",
  )

  /** Queries allowed a single-partition funnel (global window / sort):
    * either a deliberately-kept reference-parity form whose scale-safe
    * twin is registered alongside, or a window over a provably bounded
    * intermediate (never the corpus).
    */
  private val allowSingleFunnel: Map[String, String] = Map(
    "ohlc_rowbucket" -> "W1 reference-parity global row_number; scale-safe twin ohlc_rowbucket_scale registered alongside",
    "heavy_hitters" -> "window over the <=m=1024 Misra-Gries candidate recounts, not the corpus",
    "ann_ivf_md5" -> "row_number over the nlist seed rows (deterministic centroid ids), bounded by nlist",
    "semantic_dedup" -> "row_number over the nlist seed rows (shared ann_ivf_md5 cell machinery), bounded by nlist",
    "semantic_governed" -> "row_number over the nlist seed rows (the semantic_dedup machinery behind the exact arm), bounded by nlist",
    "semantic_preflight" -> "row_number over the nlist seed rows (the semantic_dedup assignment machinery), bounded by nlist",
    "ann_pq" -> "row_number over the `codes` seed rows (md5 codebook), bounded by codes",
    "ann_ivfpq" -> "row_number over the nlist/codes seed rows, bounded by max(nlist, codes)",
    "semantic_dedup_hier" -> "row_number over the `coarse` seed rows; the fine-seed window is cid-PARTITIONED, never global",
    "semantic_dedup_capped" -> "row_number over the `coarse` seed rows; the fine-seed window is cid-PARTITIONED, never global",
    "semantic_clusters" -> "row_number over the nlist seed rows (shared cell machinery), bounded by nlist",
    "vocab_growth" -> "running sums over <=nBuckets=10 bucket rows (post-aggregate), never the corpus",
  )

  /** Queries allowed to read a base table's full column set. */
  private val allowFullScan: Map[String, String] = Map(
    "dedup_rows" -> "whole-row dedup compares every column by definition",
    "dedup_incremental" -> "emits surviving full documents; every column is payload",
    "dedup_incremental_bloom" -> "emits surviving full documents; every column is payload",
    "jsonl_roundtrip" -> "roundtrips the whole documents table through JSONL; every column is payload",
  )

  // Base-table widths, read once from the parquet footers themselves so
  // the lint tracks the generator, not a hardcoded copy of the schema.
  private lazy val tableWidths: Map[String, Int] = {
    val dir = new java.io.File(sf)
    dir.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
      f.getName.stripSuffix(".parquet") ->
        spark.read.parquet(f.getPath).schema.size
    }.toMap
  }

  /** Walk the tree tracking the nearest STRUCTURAL parent — codegen
    * wrappers (WholeStageCodegen, InputAdapter) are transparent, so an
    * exchange feeding `InputAdapter -> WholeStageCodegen(HashAggregate)`
    * classifies by the aggregate, not the plumbing.
    */
  private def walk(node: SparkPlan, parent: Option[SparkPlan],
                   onExchange: (ShuffleExchangeExec, Option[SparkPlan]) => Unit): Unit = {
    node match {
      case ex: ShuffleExchangeExec if ex.outputPartitioning == SinglePartition =>
        onExchange(ex, parent)
      case _ => ()
    }
    val nextParent = node match {
      case _: InputAdapter | _: WholeStageCodegenExec => parent
      case _ => Some(node)
    }
    node.children.foreach(walk(_, nextParent, onExchange))
  }

  /** Staleness guard for the BNLJ whitelist: a whitelisted query's
    * broadcast side must STILL be bounded by construction — a subtree
    * containing a literal limit, a grouping-less (scalar) aggregate, a
    * literal-comparison filter (the `vec_id = 0` / `doc_id < 500`
    * selection patterns), or a driver-built local table. A refactor
    * that turns a whitelisted query into a genuine corpus×corpus nested
    * loop (two unbounded scans, no such bound on the broadcast side)
    * fails the lint instead of hiding behind the stale entry.
    */
  private def boundedBroadcastSide(p: SparkPlan): Boolean = {
    def bounded(node: SparkPlan): Boolean = node match {
      case _: GlobalLimitExec | _: CollectLimitExec |
           _: TakeOrderedAndProjectExec => true
      case a: HashAggregateExec if a.groupingExpressions.isEmpty => true
      case a: SortAggregateExec if a.groupingExpressions.isEmpty => true
      case a: ObjectHashAggregateExec if a.groupingExpressions.isEmpty => true
      case f: FilterExec if f.condition.exists {
        case cmp: BinaryComparison =>
          cmp.left.isInstanceOf[Literal] || cmp.right.isInstanceOf[Literal]
        case _ => false
      } => true
      case _: LocalTableScanExec => true
      // an engine-WRITTEN artifact scan (bounds row, seed table,
      // centroid catalog) is bounded by its writer's contract; only
      // base-corpus scans (under the sf dir) are unbounded here
      case s: FileSourceScanExec
        if !s.relation.location.rootPaths.exists(_.toString.contains("/testdata/")) =>
        true
      case r: ReusedExchangeExec => bounded(r.child)
      case other => other.children.exists(bounded)
    }
    bounded(p)
  }

  private def lint(name: String, plan: SparkPlan): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()

    plan.foreach {
      case _: CartesianProductExec =>
        out += "CartesianProduct"
      case _: BroadcastNestedLoopJoinExec if !allowBnlj.contains(name) =>
        out += "BroadcastNestedLoopJoin (not whitelisted)"
      case b: BroadcastNestedLoopJoinExec =>
        val bcast = if (b.buildSide == BuildLeft) b.left else b.right
        if (!boundedBroadcastSide(bcast))
          out += "whitelisted BNLJ whose broadcast side no longer matches " +
            "a bounded pattern (stale whitelist entry?)"
      case w: WindowExec if w.partitionSpec.isEmpty && !allowSingleFunnel.contains(name) =>
        out += "global Window (empty partitionSpec)"
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty && !allowSingleFunnel.contains(name) =>
        out += "global WindowGroupLimit (empty partitionSpec)"
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toString)
          .filter(_.contains("/testdata/"))
          .flatMap { p =>
            val base = p.split('/').last.stripSuffix(".parquet")
            tableWidths.get(base).map(base -> _)
          }
          .foreach { case (table, width) =>
            if (s.output.size >= width && width >= 5 && !allowFullScan.contains(name))
              out += s"unpruned scan of $table (reads all $width columns)"
          }
      case _ => ()
    }

    // single-partition shuffles: fine only under a final scalar
    // aggregate or a limit (rows reaching them are O(partitions) or O(k))
    walk(plan, None, (_, parent) => parent match {
      case Some(_: HashAggregateExec | _: SortAggregateExec |
                _: ObjectHashAggregateExec | _: GlobalLimitExec |
                _: CollectLimitExec | _: TakeOrderedAndProjectExec) => ()
      case other if !allowSingleFunnel.contains(name) =>
        out += s"SinglePartition exchange feeding ${other.map(_.nodeName).getOrElse("<root>")}"
      case _ => ()
    })
    out.toSeq
  }

  test("every registered query passes the scale-plan lint") {
    // dedicated session: AQE off so the REAL physical tree (not an
    // AdaptiveSparkPlan wrapper) is walkable, without leaking the
    // setting to suites sharing the JVM-wide session
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")

    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(s, sf).queryExecution.executedPlan
          lint(name, plan).map(v => s"$name: $v")
        } catch {
          case e: Throwable => Seq(s"$name: plan construction failed: ${e.getMessage}")
        }
    }
    assert(violations.isEmpty,
      s"\n${violations.size} plan-lint violations:\n${violations.mkString("\n")}")

    // every whitelist entry must still be registered — a renamed or
    // removed query must not leave a dangling exemption behind
    val registered = SparkEntry.queries.keySet
    val dangling = (allowBnlj.keySet ++ allowSingleFunnel.keySet ++
      allowFullScan.keySet).diff(registered)
    assert(dangling.isEmpty, s"whitelist entries for unregistered queries: $dangling")
  }

  test("BNLJ staleness guard can fire: an unbounded corpus-x-corpus broadcast side is NOT bounded") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    // a genuine nested loop: full documents scan x broadcast full nation
    // scan, no limit/scalar-agg/literal-filter anywhere on the build side
    val plan = s.read.parquet(s"$sf/documents.parquet")
      .crossJoin(org.apache.spark.sql.functions.broadcast(
        s.read.parquet(s"$sf/nation.parquet")))
      .queryExecution.executedPlan
    val bnlj = plan.collectFirst { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnlj.isDefined, s"fixture no longer plans a BNLJ:\n$plan")
    val side = if (bnlj.get.buildSide == BuildLeft) bnlj.get.left else bnlj.get.right
    assert(!boundedBroadcastSide(side),
      "guard failed to flag an unbounded broadcast side")
  }
}
