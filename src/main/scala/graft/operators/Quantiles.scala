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
    */
  def rankedPercentiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double]
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
    // pass 1: per-(partition, group) counts — control-plane sized
    val counts = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { case (g, _) => m.update(g, m.getOrElse(g, 0L) + 1) }
        m.iterator.map { case (g, c) => (pid, g, c) }
      }
      .collect()
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
}
