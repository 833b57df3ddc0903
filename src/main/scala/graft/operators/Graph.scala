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
    if (!edgeCountExceeds(mat, smallGraphEdges)) unionFindLocal(mat)
    else distributedCC(mat, maxIters)
  }

  /** Bounded branch probe: true iff `df` holds MORE than `threshold`
    * rows. `limit(threshold+1)` makes the probe's work proportional to
    * the THRESHOLD, not the data — CollectLimit scans partitions
    * incrementally and stops at threshold+1 rows, so on a 100 TB edge
    * set the probe touches a handful of partitions instead of paying a
    * full count() pass just to pick a code path.
    */
  private[graft] def edgeCountExceeds(df: DataFrame, threshold: Long): Boolean =
    // limit() takes an Int; beyond that a capped probe could never
    // exceed the threshold (silently inverting the branch), so fall
    // back to the exact count for astronomically large thresholds
    if (threshold >= Int.MaxValue) df.count() > threshold
    else df.limit(threshold.toInt + 1).count() > threshold

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
    // the frame whose checkpoint blocks the NEXT round supersedes —
    // dropped only after the replacement has eagerly materialized
    var prevCkpt = labels
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
      Checkpoints.dropBlocks(prevCkpt)
      prevCkpt = updated
      iter += 1
    }
    labels
  }

  /** Contribution quantum for the deterministic rank recurrences:
    * per-edge contributions are rounded to integer multiples of
    * 1/RankGrain before summing. Total rank mass is ≤ 1, so a
    * per-node sum of quanta is ≤ 1e15 (< 2^53) — every intermediate
    * stays exactly representable as both BIGINT and binary64, and the
    * grain itself leaves ~15 significant digits in every rank.
    */
  private[graft] val RankGrain: Double = 1.0e15

  /** One rank-propagation step, shared by [[pageRank]] and
    * [[personalizedPageRank]]: join ranks onto the edge list by src,
    * QUANTIZE each contribution r/outdeg to an integer number of
    * grains (HALF_UP, the rounding Spark `round` and DuckDB `ROUND`
    * agree on for doubles), and sum the BIGINT quanta per dst.
    *
    * Integer addition is associative and commutative, so the quantized
    * sum is bit-identical under ANY partitioning/aggregation order —
    * the property the previous design bought with a two-level
    * collect_list ordered fold. Unlike collect_list, a plain BIGINT
    * `sum` is a declarative aggregate: Spark plans it as
    * partial_sum (map-side combine) + final sum, so the shuffle
    * carries one row per (dst, map partition) instead of one row per
    * EDGE — on the sf10 notch this cut recorded spill from ~78 GB per
    * bench run to zero. Skewed in-degree (celebrity nodes) is absorbed
    * the same way: the hub's edges collapse to one partial row per map
    * task before the exchange.
    */
  private[graft] def contribSums(e: DataFrame, r: DataFrame): DataFrame =
    e.join(
        r.select(col("id").as("src"),
          round((col("r") / col("outdeg")) * lit(RankGrain)).cast("long").as("cq")),
        "src")
      .select(col("dst"), col("cq"))
      .groupBy("dst")
      .agg(sum("cq").as("sq"))

  /** Deterministic PageRank: per-destination contributions are
    * quantized to integer grains ([[RankGrain]]) and summed as
    * BIGINTs ([[contribSums]]), so every rank is bit-reproducible
    * under any partitioning — a plain double sum varies in the last
    * ulps with aggregation order and would break exact replay, while
    * the integer-grain sum is order-insensitive BY CONSTRUCTION and
    * keeps map-side partial aggregation (which an ordered fold over
    * collect_list forfeits). Oracles replay the closed form
    * r' = t/n + d·(Σ round(r/outdeg·G))/G with plain SQL SUM.
    * Dangling mass is dropped (the simplified recurrence); feed
    * symmetrized edges if every node must keep out-degree > 0.
    *
    * Scale shape: each iteration is one equi-join on src and one
    * hash aggregate with map-side combine — shuffle volume is
    * O(distinct dst × map partitions), independent of edge count.
    *
    * @param edges (src, dst) directed edge list, deduplicated
    * @param teleport passed separately from damping (not computed as
    *   1 − damping: 1.0 − 0.85 is 0.15000000000000002 in binary64,
    *   NOT the literal 0.15 an oracle query writes)
    */
  def pageRank(
      edges: DataFrame, iters: Int,
      damping: Double = 0.85, teleport: Double = 0.15): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long")).localCheckpoint()
    // not checkpointed: nodes feeds only `nd`, which is itself
    // localCheckpointed two lines down — materializing both would
    // store the same rows twice
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // out-degree is static — carry it INSIDE the rank frame so each
    // iteration joins the edge table exactly once, with no separate
    // weight join (dangling nodes keep a null outdeg; they never
    // appear as a src, so their contrib is never read)
    val nd = nodes.join(deg.withColumnRenamed("src", "id"), Seq("id"), "left").localCheckpoint()
    val n = nd.agg(count(lit(1)).as("cnt"))
    var r = nd.crossJoin(broadcast(n))
      .select(col("id"), (lit(1.0) / col("cnt")).as("r"), col("outdeg"))
    var prevCkpt: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val s = contribSums(e, r)
      r = nd
        .join(s.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .crossJoin(broadcast(n))
        .select(col("id"),
          (lit(teleport) / col("cnt") +
            lit(damping) * (coalesce(col("sq"), lit(0L)).cast("double") / lit(RankGrain))).as("r"),
          col("outdeg"))
        .localCheckpoint() // keep the iterated plan flat
      prevCkpt.foreach(Checkpoints.dropBlocks) // superseded round's blocks
      prevCkpt = Some(r)
    }
    r.select("id", "r")
  }

  /** Personalized PageRank (Haveliwala 2002): the teleport mass lands
    * only on the SEED set instead of uniformly, so ranks measure
    * relevance TO that cohort — the "recommend suppliers for these
    * customers" primitive. Same deterministic integer-grain quantized
    * sum ([[contribSums]]),
    * same one-edge-join-per-iteration shape as [[pageRank]]; the seed
    * set is a DataFrame (may be huge at 100 TB — it joins by id, it
    * is never collected or broadcast as a literal). Dangling mass is
    * dropped, matching [[pageRank]]'s convention, so oracles replay
    * the same closed form.
    */
  def personalizedPageRank(
      edges: DataFrame, seeds: DataFrame, iters: Int,
      damping: Double = 0.85, teleport: Double = 0.15): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long")).localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val sd = seeds.select(col("id").cast("long")).distinct().withColumn("is_seed", lit(1L))
    val nd = nodes
      .join(deg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .join(sd, Seq("id"), "left")
      .localCheckpoint()
    val nS = nd.agg(sum(coalesce(col("is_seed"), lit(0L))).as("scnt")).localCheckpoint()
    // Fail fast on an empty (or graph-disjoint) seed cohort: scnt = 0
    // would silently turn every teleport term into Infinity/NaN. The
    // check reads the already-computed 1-row aggregate — control-plane.
    val scnt = nS.head().getLong(0)
    require(scnt > 0,
      s"personalizedPageRank: seed set is empty or disjoint from the graph (scnt=$scnt)")
    val seedMass = when(col("is_seed") === 1L, lit(1.0) / col("scnt")).otherwise(lit(0.0d))
    var r = nd.crossJoin(broadcast(nS))
      .select(col("id"), seedMass.as("r"), col("outdeg"), col("is_seed"))
    var prevCkpt: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val s = contribSums(e, r)
      r = nd
        .join(s.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .crossJoin(broadcast(nS))
        .select(col("id"),
          (lit(teleport) * coalesce(col("is_seed"), lit(0L)) / col("scnt") +
            lit(damping) * (coalesce(col("sq"), lit(0L)).cast("double") / lit(RankGrain))).as("r"),
          col("outdeg"), col("is_seed"))
        .localCheckpoint() // keep the iterated plan flat
      prevCkpt.foreach(Checkpoints.dropBlocks) // superseded round's blocks
      prevCkpt = Some(r)
    }
    r.select("id", "r")
  }
}
