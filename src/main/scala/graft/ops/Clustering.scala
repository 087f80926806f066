package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the terminal stage of fuzzy
  * dedup. Pair miners (MinHash-LSH, SimHash bands, embedding LSH — all in
  * [[Similarity]]) emit EDGES; keep/drop decisions need COMPONENTS,
  * because near-duplication is transitive in practice (A≈B, B≈C ⇒ the
  * family is one document): keep one canonical doc per component, drop
  * the rest.
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
  * and Beyond", SOCC 2014). Each round rewrites the edge list so that
  * nodes hook onto ever-smaller labels:
  *
  *   - large-star(v): connect every STRICTLY LARGER neighbor of v to the
  *     minimum of v's closed neighborhood — long tails collapse toward
  *     local minima in parallel;
  *   - small-star(v): connect every smaller-or-equal neighbor (and v
  *     itself) to that minimum — flattens the partial trees into stars.
  *
  * Converged when a full round leaves the edge set unchanged; at that
  * point the edges form a star forest whose center is each component's
  * minimum id. Round count is O(log n) even on pathological long-chain
  * graphs (vs. component DIAMETER for plain min-label propagation — the
  * difference between ~14 rounds and ~10,000 on a 10k-node chain).
  *
  * Scale: every round shuffles only (long, long) edge pairs — document
  * payloads never enter the loop — and [[Checkpoints.stable]] truncates
  * the lineage so plans don't deepen with iteration (reliable
  * `checkpoint()` when the session has a checkpoint dir — the cluster
  * configuration, surviving executor loss mid-loop — else
  * `localCheckpoint()` for single-JVM runs). Per round the driver
  * sees two materializations and one scalar fingerprint agg; nothing
  * proportional to data size is collected. The previous diameter-round
  * min-label implementation is kept as [[connectedComponentsMinLabel]]
  * and cross-checked in ClusteringSpec on shared fixtures.
  */
object Clustering {

  /** Components of the undirected graph given by (srcCol, dstCol) pairs.
    * Returns one row per node that appears in any edge:
    * `(id, cluster_id)` where `cluster_id` = min node id reachable.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50): DataFrame =
    connectedComponentsWithRounds(edges, srcCol, dstCol, maxIter)._1

  /** Same, also reporting how many large-star/small-star rounds ran —
    * exposed so tests can assert the O(log n) bound on adversarial
    * fixtures instead of trusting the scaladoc.
    */
  private[graft] def connectedComponentsWithRounds(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): (DataFrame, Int) = {
    // Canonical directed form: (a, b) with a > b, self-loops dropped,
    // deduped. Orientation is an invariant both steps below preserve.
    var e = Checkpoints.stable(edges
      .select(col(srcCol).cast("long").as("x"), col(dstCol).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("a"), least(col("x"), col("y")).as("b"))
      .distinct())

    // Edge-set fingerprint: (count, xor of per-edge 64-bit hashes). Edges
    // are distinct within a round, so xor is order- and partition-stable;
    // one scalar agg per round replaces a full except() comparison.
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        count(lit(1)).as("c"),
        coalesce(bit_xor(xxhash64(col("a"), col("b"))), lit(0L)).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }

    var fp = fingerprint(e)
    var iter = 0
    var converged = fp._1 == 0L // no edges → star forest vacuously
    while (!converged && iter < maxIter) {
      // Large-star. Work on the symmetric view; for each node a with
      // closed-neighborhood min m = least(a, min b), re-point every
      // strictly larger neighbor at m. Output keeps a > b orientation
      // because m <= a < neighbor.
      val sym = e.select(col("a"), col("b"))
        .unionByName(e.select(col("b").as("a"), col("a").as("b")))
      val nmin = sym.groupBy(col("a")).agg(min(col("b")).as("nm"))
      // NOT cut (r18-opt v2): both small-star consumers sit inside the
      // ONE `next` materialization action, where large's distinct ends
      // in a canonically identical exchange — runtime exchange reuse
      // computes it once (measured in the AQE-final tree; the cut's
      // extra eager job per round cost more than the reuse saves).
      // Only the final round's convergence check recomputes it, once,
      // from the still-cut `e`.
      val large = sym.join(nmin, "a")
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), least(col("a"), col("nm")).as("b"))
        .distinct()

      // Small-star. Edges point big→small, so grouping by the big end
      // sees exactly the smaller neighbors; hook them (and the big end)
      // onto the group minimum. Both emitted shapes keep a > b.
      val smin = large.groupBy(col("a")).agg(min(col("b")).as("m"))
      val relinked = large.join(smin, "a")
        .filter(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b"))
      val hooked = smin.select(col("a"), col("m").as("b"))
      val next = Checkpoints.stable(relinked.unionByName(hooked).distinct())

      // Converged only when BOTH steps were no-ops (the paper's
      // termination condition) — a fixpoint of the composition alone
      // would not prove star-forest shape. r18-opt: the small-star
      // fingerprint decides first and the large-star one runs ONLY when
      // it matches (short-circuit — identical verdict, one fewer
      // aggregate job on every non-final round; the loop's wall is
      // driver-round latency, not data volume).
      val nfp = fingerprint(next)
      converged = nfp == fp && fingerprint(large) == fp
      fp = nfp
      // the superseded round's pinned blocks are dead the moment `next`
      // is materialized — release them now instead of waiting out
      // ContextCleaner GC (the governance-refusal hygiene rule)
      Checkpoints.release(e)
      e = next
      iter += 1
    }
    require(converged, s"connectedComponents: no convergence in $maxIter rounds")

    // Star forest: children are the a side, roots only ever on the b side.
    // Every node from the original edge list appears exactly once.
    val labels = e.select(col("a").as("id"), col("b").as("cluster_id"))
      .unionByName(e.select(col("b").as("id"), col("b").as("cluster_id")).distinct())
    (labels, iter)
  }

  /** Reference implementation: iterative minimum-label propagation
    * (label = min of own + neighbor labels per round; rounds = component
    * diameter). Kept as the independently-derived cross-check for the
    * large-star/small-star path — same output contract, different
    * algorithm family. Do not use on long-chain graphs at scale.
    */
  private[graft] def connectedComponentsMinLabel(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 200): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .unionByName(edges
        .select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .localCheckpoint() // the edge list is reused every round — pin it
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val neighborMin = sym
        .join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("nid"))
        .agg(min(col("label")).as("nmin"))
      val stepped = labels
        .join(neighborMin, labels("id") === neighborMin("nid"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("next"))
        .localCheckpoint()
      changed = stepped.filter(col("next") < col("label")).count()
      labels = stepped.select(col("id"), col("next").as("label"))
      iter += 1
    }
    require(changed == 0, s"connectedComponentsMinLabel: no convergence in $maxIter rounds")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Fuzzy-dedup verdicts from a similarity pair list: each paired doc's
    * component, the component size, and the keep/drop flag (the lowest
    * doc_id in a component is the canonical survivor — deterministic and
    * engine-agnostic, no tie to arrival order). Docs in no pair are
    * implicitly kept and not listed (at 100 TB that's the overwhelming
    * majority — emitting only the contested rows keeps the verdict table
    * proportional to the near-dup population, not the corpus).
    */
  def dedupClusters(pairs: DataFrame,
                    aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame =
    dedupClustersFromLabels(connectedComponents(pairs, aCol, bCol))

  /** [[dedupClusters]] over an ALREADY-COMPUTED label table (id,
    * cluster_id) — the production split: the O(log n)-round closure runs
    * once and its labels persist as a lake artifact; every governance
    * consumer (verdicts here, [[clusterSizeHistogramFromLabels]],
    * [[clusterKeepBestFromLabels]]) re-reads the labels instead of
    * re-deriving the components from the pair list.
    */
  def dedupClustersFromLabels(labels: DataFrame): DataFrame = {
    val sizes = labels.groupBy(col("cluster_id").as("cid"))
      .agg(count(lit(1)).as("cluster_size"))
    // un-hinted: cluster count tracks the near-dup population, which can
    // be anything from tiny to huge — AQE picks broadcast when it fits
    labels.join(sizes, col("cluster_id") === col("cid"))
      .select(col("id").as("doc_id"), col("cluster_id"),
        col("cluster_size"), (col("id") === col("cluster_id")).as("keep"))
  }

  /** Quality-aware cluster representative selection — [[dedupClusters]]
    * with the survivor chosen by SCORE instead of min id: within each
    * near-dup component keep the highest-`scoreCol` member (ties → lowest
    * id). This is the curation-grade terminal stage: a near-dup family
    * usually contains one clean original and N mangled crawls, and the
    * min-id rule keeps whichever was crawled first — the score rule keeps
    * the best one (the [[graft.ops.Similarity.dedupKeepBest]] policy
    * lifted from exact-key groups to fuzzy components).
    *
    * `scored` maps id → score; only ids appearing in a pair are looked up
    * (the join is component-table-sized, not corpus-sized). The winner is
    * one max(struct(score, −id)) per component — same engine-agnostic
    * total order as dedupKeepBest, no window sort. Docs in no pair are
    * implicitly kept and not listed, as in [[dedupClusters]].
    */
  def clusterKeepBest(pairs: DataFrame, scored: DataFrame,
                      idCol: String = "doc_id", scoreCol: String = "quality",
                      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame =
    clusterKeepBestFromLabels(connectedComponents(pairs, aCol, bCol),
      scored, idCol, scoreCol)

  /** [[clusterKeepBest]] over a persisted label table — see
    * [[dedupClustersFromLabels]] for the artifact split rationale.
    */
  def clusterKeepBestFromLabels(comp: DataFrame, scored: DataFrame,
                                idCol: String = "doc_id",
                                scoreCol: String = "quality"): DataFrame = {
    val withScore = comp.join(
      scored.select(col(idCol).as("id"), col(scoreCol).as("_score")), Seq("id"))
    val winners = withScore.groupBy(col("cluster_id").as("cid"))
      .agg(count(lit(1)).as("cluster_size"),
        max(struct(col("_score"), (-col("id")).as("neg"))).as("w"))
      .select(col("cid"), col("cluster_size"),
        (-col("w.neg")).as("best_id"), col("w._score").as("best_score"))
    withScore.join(winners, col("cluster_id") === col("cid"))
      .select(col("id").as(idCol), col("cluster_id"), col("cluster_size"),
        col("_score").as(scoreCol), (col("id") === col("best_id")).as("keep"))
  }

  /** Cluster-SIZE histogram of the near-dup graph — the dedup
    * governance chart every curation report carries: how many
    * components of each size, how many documents they hold, and the
    * implied removal count (size − 1 per component). A fat tail here
    * means template families or mirror sites; a spike at huge sizes
    * usually means the similarity threshold is too loose — this is the
    * number to look at BEFORE deleting (size·clusters − clusters) docs.
    *
    * Shape: [[connectedComponents]]'s output aggregates twice — per
    * component (near-dup-population-sized) then per SIZE (a handful of
    * rows). Nothing corpus-sized shuffles.
    */
  def clusterSizeHistogram(pairs: DataFrame,
                           aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame =
    clusterSizeHistogramFromLabels(connectedComponents(pairs, aCol, bCol))

  /** [[clusterSizeHistogram]] over a persisted label table — see
    * [[dedupClustersFromLabels]] for the artifact split rationale.
    */
  def clusterSizeHistogramFromLabels(labels: DataFrame): DataFrame =
    labels
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"),
        (sum(col("cluster_size")) - count(lit(1))).as("n_removable"))
}
