package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of distributive aggregates — the pattern
  * that replaces "re-scan 100 TB nightly" with "aggregate today's
  * partition, merge into the summary". Works for any distributive or
  * algebraic aggregate (count/sum/min/max here; the sketch family —
  * HLL registers, KMV, CM — merges the same way, see
  * `ApproxDistinct`/`Dedup.compact*` for those).
  *
  * The contract is `merge(partial(A), partial(B)) == partial(A ∪ B)`
  * bit-exactly: counts and decimal-cents sums are integers, min/max
  * are order-insensitive, so the merged summary is indistinguishable
  * from a full recompute — which is exactly what the catalog row
  * `x41_incremental_agg` proves against the DuckDB full-scan oracle.
  */
object Incremental {

  /** One batch's partial summary: per group, mergeable components
    * only. `sum_value_exact` keeps the money sum exact as
    * DECIMAL(18,2) DOLLARS (per-value decimal casts, see
    * Query.sumMoneySql) — NOT the integer-cents lift used by x40/x45/
    * td50; don't union it with a cents frame.
    */
  def partialSummary(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("decimal(18,2)").as("sum_value_exact"),
        min(col("ts").cast("date")).as("first_day"),
        max(col("ts").cast("date")).as("last_day"))

  /** Merge any number of partial summaries into one — the nightly
    * "fold the new partition in" step. Union + re-aggregate is the
    * whole algorithm: each component's merge IS its own aggregate.
    */
  def mergeSummaries(partials: DataFrame*): DataFrame =
    partials.reduce(_ unionByName _)
      .groupBy(col("event_type"))
      .agg(
        sum(col("n_events")).cast("long").as("n_events"),
        sum(col("sum_value_exact")).cast("decimal(18,2)").as("sum_value_exact"),
        min(col("first_day")).as("first_day"),
        max(col("last_day")).as("last_day"))
}
