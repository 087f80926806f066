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
  * Algorithm: iterative minimum-label propagation. Every node starts
  * labeled with its own id; each round every node takes the min of its
  * own label and its neighbors' labels; converged when a round changes
  * nothing. Each round is one equi-join + groupBy — hash-partitioned on
  * the node id, no global structure — and `localCheckpoint` truncates
  * the lineage so the plan doesn't deepen with the iteration count.
  *
  * Scale: rounds needed = the largest component's diameter. Near-dup
  * graphs are dense little clique-ish families (diameter 2–4), not long
  * chains — so this converges in a handful of rounds on real corpora,
  * each round a linear shuffle of (id, label) pairs only (8+8 bytes a
  * row; document payloads never enter the loop). The per-round driver
  * `count()` is one scalar, not a collect. For adversarial long-chain
  * graphs the known upgrade is large-star/small-star (O(log n) rounds);
  * the loop structure below is deliberately the same shape, so that
  * swap is local.
  */
object Clustering {

  /** Components of the undirected graph given by (srcCol, dstCol) pairs.
    * Returns one row per node that appears in any edge:
    * `(id, cluster_id)` where `cluster_id` = min node id reachable.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50): DataFrame = {
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
    require(changed == 0, s"connectedComponents: no convergence in $maxIter rounds")
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
                    aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
    val sizes = comp.groupBy(col("cluster_id").as("cid"))
      .agg(count(lit(1)).as("cluster_size"))
    // un-hinted: cluster count tracks the near-dup population, which can
    // be anything from tiny to huge — AQE picks broadcast when it fits
    comp.join(sizes, col("cluster_id") === col("cid"))
      .select(col("id").as("doc_id"), col("cluster_id"),
        col("cluster_size"), (col("id") === col("cluster_id")).as("keep"))
  }
}
