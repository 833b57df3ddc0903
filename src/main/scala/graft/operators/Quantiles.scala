package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles per group via distributed RANK
  * arithmetic — the 100 TB answer to `percentile()`'s aggregation
  * buffer, which holds EVERY value of a group on one task (x24's
  * documented bound; with 3 groups that is 3 busy tasks no matter how
  * many cores exist).
  *
  * Shape: one range-partitioned sort of (group, value) — Spark's sort
  * machinery spreads it over ALL partitions, spilling as needed — then
  * global ranks from a two-pass offset computation (per-partition
  * group counts → driver prefix sums → broadcast back; the collected
  * counts are ≤ partitions × groups rows, control-plane sized). The
  * interpolated percentile needs only the two order statistics
  * adjacent to each target position, so after ranking, a
  * filter-to-tiny picks ≤ 2 rows per (group, percentile).
  *
  * Interpolation replays `Percentile`'s exact arithmetic —
  * `(hi − pos)·v_lo + (pos − lo)·v_hi` at `pos = (n−1)·p` — so the
  * result is bit-identical to `expr("percentile(v, p)")` and to the
  * DuckDB PERCENTILE_CONT oracle (the same parity x02/x24 proved).
  */
object Quantiles {

  /** @return (groupCol, p, value), one row per group × percentile.
    *
    * Null semantics match the drop-in `expr("percentile(v, p)")`: null
    * VALUES are ignored (the aggregate skips them; without the filter
    * here the typed decode would throw instead), and a group whose
    * values are all null disappears from the output the same way a
    * null-only group yields a null percentile. Null GROUP KEYS are
    * kept as their own group, like `groupBy` does.
    *
    * Two physical paths, picked by MEASURED cardinality (a cheap count
    * of the per-(partition, group) pairs — range partitioning on
    * (g, v) keeps that ≈ groups + partitions, since each group spans
    * contiguous partitions):
    *   - at or below `maxBroadcastEntries`, offsets ride to the driver
    *     and back as two broadcast maps (the x24/x32/x33 shape — a few
    *     groups, no join overhead);
    *   - above it, nothing group-cardinality-sized ever lands on the
    *     driver: counts stay a DataFrame, offsets come from a window
    *     over (g ORDER BY pid), and global ranks are joined, not
    *     broadcast from a Scala map. Per-source percentiles over
    *     millions of sources take this path automatically.
    * Both paths share the sort and the `Percentile` interpolation
    * arithmetic, so results are bit-identical to each other and to
    * `expr("percentile(v, p)")`.
    */
  def rankedPercentiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double],
      maxBroadcastEntries: Long = 10000L
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    // frozen once: the two rank passes must observe the SAME
    // partitioning (range bounds vary per run; ranks do not)
    val sorted = df
      .select(col(groupCol).cast("string").as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull) // percentile() skips null values
      .repartitionByRange(parts, col("g"), col("v"))
      .sortWithinPartitions("g", "v")
      .as[(String, Double)]
      .localCheckpoint()
    // pass 1: per-(partition, group) counts — kept DISTRIBUTED until the
    // cardinality probe proves they are control-plane sized
    val countsRdd = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { case (g, _) => m.update(g, m.getOrElse(g, 0L) + 1) }
        m.iterator.map { case (g, c) => (pid, g, c) }
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEntries = countsRdd.count()
    val out =
      if (nEntries > maxBroadcastEntries)
        distributedPercentiles(sorted.toDF("g", "v"), countsRdd, ps, groupCol)
      else broadcastPercentiles(sorted, countsRdd.collect(), ps, groupCol)
    countsRdd.unpersist(blocking = false)
    out
  }

  /** Low-cardinality path: offsets via driver prefix sums + broadcast
    * maps (≤ `maxBroadcastEntries` (pid, group) pairs by construction).
    */
  private def broadcastPercentiles(
      sorted: org.apache.spark.sql.Dataset[(String, Double)],
      counts: Array[(Int, String, Long)],
      ps: Seq[Double],
      groupCol: String
  ): DataFrame = {
    val spark = sorted.sparkSession
    import spark.implicits._
    val totals: Map[String, Long] =
      counts.groupBy(_._2).map { case (g, cs) => g -> cs.map(_._3).sum }
    val offsets: Map[(Int, String), Long] =
      counts.groupBy(_._2).flatMap { case (g, cs) =>
        var acc = 0L
        cs.sortBy(_._1).map { case (pid, _, c) =>
          val o = ((pid, g), acc); acc += c; o
        }
      }
    // target 0-based positions per group: pos = (n-1)·p needs the
    // order statistics at ranks floor(pos) and ceil(pos)
    val wanted: Map[String, Set[Long]] = totals.map { case (g, n) =>
      g -> ps.flatMap { p =>
        val pos = (n - 1) * p
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
      }.toSet
    }
    val bcOff = spark.sparkContext.broadcast(offsets)
    val bcWanted = spark.sparkContext.broadcast(wanted)
    // pass 2: assign global ranks, keep only the wanted rows (tiny)
    val picked = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val off = bcOff.value
        val want = bcWanted.value
        val seen = scala.collection.mutable.HashMap.empty[String, Long]
        it.flatMap { case (g, v) =>
          val local = seen.getOrElse(g, 0L)
          seen.update(g, local + 1)
          val rank = off.getOrElse((pid, g), 0L) + local // 0-based
          if (want.getOrElse(g, Set.empty).contains(rank)) Some((g, rank, v)) else None
        }
      }
      .collect() // ≤ 2 × groups × percentiles rows
      .groupBy(_._1)
      .map { case (g, rows) => g -> rows.map(r => r._2 -> r._3).toMap }
    // null-safe key order (null group sorts first, like ORDER BY g)
    val out = totals.toSeq.sortBy { case (g, _) => Option(g) }.flatMap { case (g, n) =>
      val byRank = picked.getOrElse(g, Map.empty)
      ps.map { p =>
        val pos = (n - 1) * p
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        val value =
          if (hi == lo) byRank(lo)
          else (hi - pos) * byRank(lo) + (pos - lo) * byRank(hi) // Percentile's form
        (g, p, value)
      }
    }
    spark.createDataset(out).toDF(groupCol, "p", "value")
  }

  /** Exact interpolated percentiles per group via ITERATIVE HISTOGRAM
    * REFINEMENT — the selection-not-sort alternative to
    * [[rankedPercentiles]] for LOW group cardinality (x24/x32/x33's
    * shape: a handful of groups over a corpus-sized value column).
    *
    * Each order statistic is found by bisection over the value space:
    * a pass bins the candidate interval's values into `bins` buckets
    * and counts per bucket WITH exact per-bucket min/max (integer
    * counts + exact min/max — commutative, associative, so every pass
    * is one map-side-combining reduceByKey over ≤ intervals × bins
    * cells; nothing corpus-sized shuffles, sorts, or checkpoints).
    * Candidate intervals are deduplicated per group, so the first pass
    * bins each row ONCE however many percentiles were requested;
    * the driver walks the prefix sums, descends into the bucket
    * holding the target rank, and tightens the interval to that
    * bucket's OBSERVED min/max. Once a target's candidate count fits
    * the collect budget the exact value comes from a distinct-value
    * count walk. Convergence: every pass either resolves a target
    * (single distinct value, or rank 0 / count−1 hitting the exact
    * observed bounds) or strictly shrinks its candidate set — real
    * data resolves in 2–3 passes.
    *
    * vs [[rankedPercentiles]]: that form pays one range-partitioned
    * SORT of the full data plus a corpus-sized localCheckpoint so two
    * rank passes see frozen partitions; this form pays ~3 cheap scans
    * (stats, histogram, terminal) that re-read the (columnar, pruned)
    * source — at sf10 that turned x24 from 42.5 s into 22.1 s and
    * x33 from 14.9 s into 4.6 s. On a 1000-executor cluster the same
    * argument holds harder: no global sort barrier, no block-manager
    * corpus write, shuffle volume O(bins), and scans parallelize
    * embarrassingly.
    *
    * Values are bit-identical to `percentile()` / PERCENTILE_CONT:
    * selection by comparison returns EXACT order statistics whatever
    * the search strategy, and the interpolation replays `Percentile`'s
    * arithmetic term-for-term. Null semantics match [[rankedPercentiles]]
    * (null values skipped, null group kept, all-null group dropped).
    * NaN values are not supported (selection compares with <=).
    *
    * @param maxGroups hard cap on group cardinality — the driver holds
    *   O(groups × percentiles) selection states; beyond this use
    *   [[rankedPercentiles]]'s distributed path
    * @param collectBudget max candidate rows resolved by the terminal
    *   distinct-value walk (split across concurrently active targets)
    */
  def refinedPercentiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double],
      bins: Int = 4096,
      maxGroups: Int = 4096,
      collectBudget: Int = 65536,
      maxPasses: Int = 64
  ): DataFrame = {
    require(bins >= 2, s"refinedPercentiles: bins must be >= 2, got $bins")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df
      .select(col(groupCol).cast("string").as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull) // percentile() skips null values
    // pass 0: per-group n / min / max (map-side combining aggregate)
    val stats = base.groupBy("g")
      .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    require(stats.length <= maxGroups,
      s"refinedPercentiles: ${stats.length} groups exceed maxGroups=$maxGroups — " +
        "use rankedPercentiles (its distributed path keeps group state off the driver)")
    // one selection state per (group, distinct target rank)
    final class Sel(val g: String, val rank: Long, var lo: Double, var hi: Double,
                    var k: Long, var cnt: Long, var done: Boolean, var value: Double)
    val sels = scala.collection.mutable.ArrayBuffer.empty[Sel]
    for ((g, n, mn, mx) <- stats) {
      val ranks = ps.flatMap { p =>
        val pos = (n - 1) * p
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
      }.distinct
      for (r <- ranks) {
        val s = new Sel(g, r, mn, mx, r, n, false, 0.0)
        if (mn == mx) { s.done = true; s.value = mn } // one distinct value
        else if (r == 0L) { s.done = true; s.value = mn } // exact observed bound
        else if (r == n - 1L) { s.done = true; s.value = mx }
        sels += s
      }
    }
    val byId = sels.toArray
    var pass = 0
    while (byId.exists(!_.done) && pass < maxPasses) {
      pass += 1
      val active = byId.zipWithIndex.filter { case (s, _) => !s.done }
      val perBudget = math.max(1L, collectBudget.toLong / active.length)
      // candidate intervals DEDUPED per group: pass 1 always has ONE
      // interval per group (every target starts at [mn, mx]), so each
      // row is binned once no matter how many percentiles were asked
      // for; later passes diverge per target but act on tiny counts.
      // Terminal intervals key cells by exact value, histogram
      // intervals by bucket index.
      val byInterval: Map[(String, Double, Double, Boolean), Array[Int]] = active
        .groupBy { case (s, _) => (s.g, s.lo, s.hi, s.cnt <= perBudget) }
        .map { case (iv, xs) => iv -> xs.map(_._2) }
      val ivs = byInterval.keys.toArray.zipWithIndex
      val plan: Map[String, Array[(Int, Double, Double, Boolean)]] = ivs
        .map { case ((g, lo, hi, term), ivid) => (g, (ivid, lo, hi, term)) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2) }
      val bc = spark.sparkContext.broadcast(plan)
      val nBins = bins
      val cells = base.as[(String, Double)].rdd
        .mapPartitions { it =>
          val pl = bc.value
          val acc = scala.collection.mutable.HashMap.empty[(Int, Long), (Long, Double, Double)]
          it.foreach { case (g, v) =>
            pl.get(g) match {
              case Some(intervals) =>
                var i = 0
                while (i < intervals.length) {
                  val (ivid, lo, hi, term) = intervals(i)
                  if (v >= lo && v <= hi) {
                    val key =
                      if (term) (ivid, java.lang.Double.doubleToLongBits(v))
                      else {
                        val w = hi - lo
                        val b =
                          if (w.isInfinity) { // ±huge bounds: midpoint split
                            if (v < lo / 2 + hi / 2) 0L else (nBins - 1).toLong
                          } else {
                            val raw = ((v - lo) / w * nBins).toLong
                            math.min(math.max(raw, 0L), (nBins - 1).toLong)
                          }
                        (ivid, b)
                      }
                    acc.get(key) match {
                      case Some((c, a, bnd)) =>
                        acc.update(key, (c + 1, math.min(a, v), math.max(bnd, v)))
                      case None => acc.update(key, (1L, v, v))
                    }
                  }
                  i += 1
                }
              case None =>
            }
          }
          acc.iterator
        }
        .reduceByKey((x, y) => (x._1 + y._1, math.min(x._2, y._2), math.max(x._3, y._3)))
        .collect()
      bc.destroy()
      val cellsByIv = cells.groupBy(_._1._1)
      for ((iv, ivid) <- ivs; sid <- byInterval(iv)) {
        val (_, _, _, terminal) = iv
        val s = byId(sid)
        val rows = cellsByIv.getOrElse(ivid, Array.empty)
        // ascending cell order: bucket index, or decoded value
        val walk =
          if (terminal)
            rows.map { case ((_, bits), (c, _, _)) =>
              val v = java.lang.Double.longBitsToDouble(bits); (v, c, v, v)
            }.sortBy(_._1)
          else rows.sortBy(_._1._2)
            .map { case ((_, b), (c, mn, mx)) => (b.toDouble, c, mn, mx) }
        var prefix = 0L
        var found = false
        for ((_, c, mn, mx) <- walk if !found) {
          if (s.k < prefix + c) {
            found = true
            if (terminal || mn == mx) { s.done = true; s.value = mn }
            else {
              s.k -= prefix; s.cnt = c; s.lo = mn; s.hi = mx
              if (s.k == 0L) { s.done = true; s.value = mn } // min of cell is exact
              else if (s.k == c - 1L) { s.done = true; s.value = mx }
            }
          } else prefix += c
        }
        assert(found, s"refinedPercentiles: rank ${s.k} not found in ${s.cnt} candidates")
      }
    }
    require(byId.forall(_.done),
      s"refinedPercentiles: unresolved targets after $maxPasses passes — " +
        "pathological value distribution; use rankedPercentiles")
    val byGroupRank: Map[(String, Long), Double] =
      byId.map(s => ((s.g, s.rank), s.value)).toMap
    // identical interpolation + output order to broadcastPercentiles
    val out = stats.toSeq.sortBy { case (g, _, _, _) => Option(g) }.flatMap {
      case (g, n, _, _) =>
        ps.map { p =>
          val pos = (n - 1) * p
          val lo = math.floor(pos).toLong
          val hi = math.ceil(pos).toLong
          val value =
            if (hi == lo) byGroupRank((g, lo))
            else (hi - pos) * byGroupRank((g, lo)) + (pos - lo) * byGroupRank((g, hi))
          (g, p, value)
        }
    }
    spark.createDataset(out).toDF(groupCol, "p", "value")
  }

  /** High-cardinality path: nothing proportional to the number of
    * groups touches the driver. Offsets = a running sum over the tiny
    * counts frame, window-partitioned BY GROUP (each window holds only
    * that group's ≤ partitions rows — no global single-task window);
    * global ranks reach the data by equi-join on (pid, g) (AQE
    * broadcasts the counts side while it is small, shuffles when it is
    * not); the ≤ 2 order statistics per (group, percentile) are kept by
    * an equi-join on (g, rank) against the wanted-positions frame.
    */
  private def distributedPercentiles(
      sorted: DataFrame,
      countsRdd: org.apache.spark.rdd.RDD[(Int, String, Long)],
      ps: Seq[Double],
      groupCol: String
  ): DataFrame = {
    val spark = sorted.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // equi-joins drop null keys, but a null GROUP is a real group (the
    // broadcast path keeps it) — encode into a never-null key with a
    // collision-free sentinel prefix, decode on output
    def enc(g: String): String = if (g == null) "\u0000" else "\u0001" + g
    val counts = countsRdd.map { case (pid, g, c) => (pid, enc(g), c) }
      .toDF("pid", "g", "cnt")
    val offsets = counts.withColumn(
      "off",
      coalesce(
        sum("cnt").over(
          Window.partitionBy("g").orderBy("pid")
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val totals = counts.groupBy("g").agg(sum("cnt").as("n"))
    // wanted 0-based positions: pos = (n−1)·p, keep ranks ⌊pos⌋ and ⌈pos⌉
    val positions = totals
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .withColumn("pos", (col("n") - lit(1L)) * col("p"))
      .withColumn("lo", floor(col("pos")))
      .withColumn("hi", ceil(col("pos")))
    val wanted = positions.select(col("g"), explode(array(col("lo"), col("hi"))).as("rank"))
      .distinct()
    // local ranks are free (rows arrive grouped + sorted per task);
    // globalize by joining the per-(pid, g) offset
    val local = sorted.as[(String, Double)].rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val seen = scala.collection.mutable.HashMap.empty[String, Long]
        it.map { case (g, v) =>
          val r = seen.getOrElse(g, 0L)
          seen.update(g, r + 1)
          (pid, enc(g), r, v)
        }
      }
      .toDF("pid", "g", "lrank", "v")
    val picked = local
      .join(offsets.select("pid", "g", "off"), Seq("pid", "g"))
      .withColumn("rank", col("off") + col("lrank"))
      .join(wanted, Seq("g", "rank")) // ≤ 2 × groups × percentiles rows survive
      .select("g", "rank", "v")
    // Percentile's interpolation, as Spark double expressions — the
    // same IEEE ops, in the same order, as the broadcast path's Scala
    val vLo = picked.select(col("g"), col("rank").as("lo"), col("v").as("v_lo"))
    val vHi = picked.select(col("g"), col("rank").as("hi"), col("v").as("v_hi"))
    positions
      .join(vLo, Seq("g", "lo"))
      .join(vHi, Seq("g", "hi"))
      .withColumn(
        "value",
        when(col("hi") === col("lo"), col("v_lo"))
          .otherwise(
            (col("hi").cast("double") - col("pos")) * col("v_lo") +
              (col("pos") - col("lo").cast("double")) * col("v_hi")))
      .select(
        when(col("g") === lit("\u0000"), lit(null).cast("string"))
          .otherwise(expr("substring(g, 2)")).as(groupCol),
        col("p"), col("value"))
      .orderBy(asc_nulls_first(groupCol), col("p"))
  }
}
