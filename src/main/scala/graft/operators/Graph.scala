package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the group
  * resolver that turns pairwise near-duplicate CANDIDATES (MinHash /
  * Jaccard / cosine pairs) into dedup GROUPS: every document in a
  * component keeps/drops together, keeper = min id.
  *
  * Algorithm: iterative min-label propagation (each node adopts the
  * smallest label among itself and its neighbors) until fixpoint —
  * the standard Spark formulation; rounds ≈ graph diameter, and each
  * round is one join + one aggregate. Near-dup graphs are shallow
  * (dup clusters are cliques-ish), so this converges in 2–4 rounds
  * even at corpus scale. `localCheckpoint` truncates the growing
  * lineage so round N doesn't replay rounds 1..N-1.
  */
object Graph {

  /** @param edges two columns (src, dst); direction ignored.
    * @return (id, component) — component = min node id reachable.
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    // materialize the symmetric edge list once — every propagation
    // round joins against it, and without the checkpoint each round
    // would recompute the (possibly expensive) upstream pair pipeline
    val sym = edges
      .select(col("src").as("a"), col("dst").as("b"))
      .union(edges.select(col("dst").as("a"), col("src").as("b")))
      .localCheckpoint()
    val nodes = sym.select(col("a").as("id")).distinct()
    var labels = nodes.withColumn("component", col("id")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      // each node's new label: min(own, min over neighbors' labels)
      val neighborMin = sym
        .join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("id2"))
        .agg(min("component").as("nmin"))
      // checkpoint ONCE: `next` and the changed-count both read the
      // materialized result instead of re-running the propagation join
      val updated = labels
        .join(neighborMin, labels("id") === col("id2"), "left")
        .select(
          labels("id"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component"),
          (col("nmin") < col("component")).as("changed")
        )
        .localCheckpoint()
      changed = updated.filter(col("changed")).count()
      labels = updated.select(col("id"), col("component"))
      iter += 1
    }
    labels
  }
}
