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
