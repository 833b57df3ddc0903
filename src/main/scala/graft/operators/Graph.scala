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
    * @param smallGraphEdges below this edge count the closure runs as
    *        a driver-side union–find (near-dup candidate graphs are
    *        control-plane sized after LSH/thresholding — a distributed
    *        loop there is all fixed overhead); above it, the
    *        distributed propagation loop runs.
    * @return (id, component) — component = min node id reachable.
    */
  def connectedComponents(
      edges: DataFrame,
      maxIters: Int = 20,
      smallGraphEdges: Long = 1000000L
  ): DataFrame = {
    // materialize the (possibly expensive) upstream pair pipeline ONCE
    // — the size probe and whichever path runs both read the result
    val mat = edges.select(col("src"), col("dst")).localCheckpoint()
    val edgeCount = mat.count()
    if (edgeCount <= smallGraphEdges) unionFindLocal(mat)
    else distributedCC(mat, maxIters)
  }

  /** Driver-side union–find with path compression over a collected
    * edge list; component label = min member id (same contract as the
    * distributed path).
    */
  private def unionFindLocal(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val rows = parent.keys.toSeq.sorted.map(id => (id, find(id)))
    spark.createDataset(rows).toDF("id", "component")
  }

  private def distributedCC(edges: DataFrame, maxIters: Int): DataFrame = {
    // edges arrive pre-materialized from connectedComponents; the
    // symmetric doubling is cheap to recompute per round
    val sym = edges
      .select(col("src").as("a"), col("dst").as("b"))
      .union(edges.select(col("dst").as("a"), col("src").as("b")))
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
