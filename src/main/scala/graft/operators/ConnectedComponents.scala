package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation — the clustering stage of
  * a dedup pipeline: near-dup PAIRS (q_sim_jaccard / q_dedup_minhash
  * output) become duplicate GROUPS, from which one canonical document per
  * group survives.
  *
  * Each vertex starts labeled with its own id; every iteration each vertex
  * takes the minimum label among itself and its neighbors, so the minimum
  * id of a component floods outward and the fixpoint labels every vertex
  * with its component's smallest id — a unique, deterministic clustering
  * (no dependence on join or partition order). Convergence is detected by
  * the label sum, which strictly decreases until the fixpoint; iterations
  * are O(graph diameter), and near-dup graphs are near-cliques (diameter
  * 2-3) so a handful of passes suffice.
  *
  * Every iteration is one shuffle join (edges ⋈ labels) plus a min
  * aggregation — the map-side-combinable shape that scales out; lineage is
  * cut per iteration with localCheckpoint so plans don't grow with the
  * iteration count (on a cluster, prefer a reliable checkpoint dir). The
  * GraphX/Pregel formulation is the same computation; this one stays in
  * DataFrames so Catalyst/AQE plan each step. The star-contraction
  * variants of Kiveris et al., "Connected Components in MapReduce and
  * Beyond" (SoCC 2014) trade fewer rounds for more complex steps — worth
  * it only when graph diameter is large, which near-dup graphs aren't.
  */
object ConnectedComponents {

  /** Component label (smallest reachable vertex id) for every vertex.
    *
    * @param vertices one row per vertex
    * @param idCol    vertex id column (numeric; min must be meaningful)
    * @param edges    undirected edges, one row per pair
    * @return (id, component) — component = min id of the vertex's component
    */
  def minLabel(vertices: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionAll(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .persist()
    try {
      var labels = vertices.select(col(idCol).as("id"), col(idCol).as("component"))
        .localCheckpoint()
      // sum() of zero rows is NULL — coalesce so an empty vertex set
      // converges immediately instead of NPE-ing
      def labelSum(df: DataFrame): Long =
        df.agg(coalesce(sum(col("component")), lit(0L))).head.getLong(0)
      var prevSum = labelSum(labels)
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        val propagated = sym.join(labels, col("a") === col("id"))
          .select(col("b").as("id"), col("component"))
        val next = labels.unionByName(propagated)
          .groupBy(col("id")).agg(min(col("component")).as("component"))
          .localCheckpoint()
        val s = labelSum(next)
        converged = s == prevSum
        prevSum = s
        labels = next
        iter += 1
      }
      labels
    } finally sym.unpersist()
  }
}
