package graft

import graft.ops.Clustering

/** Connected components: transitive closure, not just pair grouping. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chains close transitively, islands stay apart") {
    // component {1,2,3,4} as a chain (diameter 3 — forces >1 round),
    // component {10,11,12} as a triangle, component {20,21} as one edge
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (21L, 20L)
    ).toDF("doc_a", "doc_b")
    val comp = Clustering.connectedComponents(edges, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: long chain converges (diameter = rounds)") {
    // a 30-node path: worst case for min-label propagation — the label
    // must walk the whole chain; proves the loop really iterates to
    // fixpoint rather than stopping after a fixed round count
    val edges = (0L until 29L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = Clustering.connectedComponents(edges, "doc_a", "doc_b").collect()
    assert(comp.length == 30)
    assert(comp.forall(_.getLong(1) == 0L))
  }

  test("dedupClusters: canonical keep flag + component sizes") {
    val pairs = Seq((5L, 9L), (9L, 7L), (30L, 31L)).toDF("doc_a", "doc_b")
    val out = Clustering.dedupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (5L, 5L, 3L, true), (7L, 5L, 3L, false), (9L, 5L, 3L, false),
      (30L, 30L, 2L, true), (31L, 30L, 2L, false)))
  }
}
