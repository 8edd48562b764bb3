package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph: the step that
  * turns pairwise dedup verdicts (MinHash / n-gram / fingerprint
  * overlaps) into canonical document groups you can actually collapse.
  *
  * Iterative min-label propagation: every node starts labeled with its
  * own id; each round a node adopts the minimum label among itself and
  * its neighbors; fixpoint = every node carries its component's minimum
  * id. Rounds needed = graph diameter (near-dup graphs are shallow —
  * clusters are cliques-ish), each round one shuffle-join + one
  * aggregate, all codegen'd. Lineage is truncated per round
  * (localCheckpoint) so the plan stays O(1) deep instead of O(rounds).
  *
  * At 100 TB scale the same loop holds: state is one (node, label) row
  * per node, joins are key-partitioned, and no driver-side collection
  * ever happens — the driver only sees the one-long `changed` count per
  * round.
  */
object DupClusters {

  /** @param nodes single-column frame of node ids (column `id`)
    * @param edges two-column frame (`src`, `dst`) of undirected edges
    * @param maxIter fail-fast bound; convergence past it throws rather
    *                than silently returning a half-propagated labeling
    * @return (id, cluster_id) — cluster_id = min node id in the component
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 25): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)

    var labels = nodes.select(col("id"), col("id").as("cluster_id"))
      .localCheckpoint(true)
    var round = 0
    var changed = 1L
    while (changed > 0) {
      if (round >= maxIter) throw new IllegalStateException(
        s"components did not converge within $maxIter rounds")
      val viaNeighbor = und
        .join(labels, und("src") === labels("id"))
        .select(col("dst").as("id"), col("cluster_id"))
      val next = labels.select("id", "cluster_id").union(viaNeighbor)
        .groupBy("id").agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("cluster_id", "prev"), "id")
        .filter(col("cluster_id") =!= col("prev")).count()
      labels = next
      round += 1
    }
    labels
  }
}
