package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MixedHash64

/** Deterministic HyperLogLog register sketch (Flajolet et al.), built
  * so every step is exactly reproducible in plain SQL — unlike the
  * built-in `approx_count_distinct` (HLL++, engine-private layout),
  * this sketch is oracle-checkable bit for bit:
  *
  *  - value hash = mixed_hash64 (rolling fold + murmur3 fmix64
  *    avalanche — the raw fold's high bits are biased on short
  *    inputs, which would saturate the leading-zero ranks);
  *  - bucket = low p bits, rho = leading-zero rank of the remaining
  *    58 bits (via the bin()-string length, identical in both
  *    engines), clamped at 40 so the 2^-rho terms span < 53 bits of
  *    mantissa — their double SUM is then EXACT and therefore
  *    aggregation-order-independent (no FP nondeterminism across
  *    partitionings);
  *  - registers = max rho per (group, bucket): max-merge is
  *    commutative, so the shuffle reduces map-side and the register
  *    table is tiny (m rows per group) regardless of input size;
  *  - raw estimate = alpha_m * m^2 / (empty + sum 2^-rho). The
  *    small-range linear-counting correction is left out (it needs
  *    ln(), which is not bit-stable cross-engine); OperatorsSpec
  *    bounds the raw estimate's error instead.
  *
  * At 100 TB: one scan, one map-side-combined shuffle of (group,
  * bucket, rho) triples, constant-size state per group.
  */
object ApproxDistinct {
  val P = 6
  val M: Int = 1 << P // 64 buckets
  val RhoClamp = 40
  val Alpha = 0.709 // alpha_64

  /** Per-row sketch inputs: appends `bucket` and `rho` for `valueCol`
    * (null values dropped — they contribute no distinct value, per
    * approx_count_distinct semantics). Shared by the batch register
    * aggregation and the streaming windowed variant
    * (`streaming.StreamingIngest.approxDistinctStream`), which need
    * different grouping keys over the same per-row derivation.
    */
  def registerInputs(df: DataFrame, valueCol: String): DataFrame = {
    MixedHash64.register(df.sparkSession)
    val bitLen = when(col(s"${valueCol}__w") === 0, lit(0))
      .otherwise(length(bin(col(s"${valueCol}__w"))))
    df.filter(col(valueCol).isNotNull)
      .withColumn(s"${valueCol}__h", MixedHash64(col(valueCol).cast("string")))
      .withColumn(s"${valueCol}__w", expr(s"shiftrightunsigned(${valueCol}__h, $P)"))
      .withColumn("bucket", pmod(col(s"${valueCol}__h"), lit(M.toLong)))
      .withColumn("rho", least(lit(RhoClamp), lit(64 - P + 1) - bitLen))
      .drop(s"${valueCol}__h", s"${valueCol}__w")
  }

  /** (groupCols..., bucket, max_rho) — the mergeable sketch state. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    registerInputs(df, valueCol)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max("rho").as("max_rho"))

  /** HLL estimate per group from the register table.
    *
    * @param corrected apply the standard small-range linear-counting
    *        correction (`m * ln(m / empty)` when the raw estimate is
    *        below 2.5m and empty buckets remain). The raw estimator
    *        floors near 0.7m for tiny cardinalities; production use
    *        wants the correction. The oracle-checked query keeps
    *        corrected=false because ln() is not bit-stable across
    *        engines — the raw path stays EXACTLY reproducible.
    */
  def hllEstimate(
      registers: DataFrame,
      groupCols: Seq[String],
      corrected: Boolean = true
  ): DataFrame = {
    val base = registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_filled"),
        sum(expr("1.0 / shiftleft(cast(1 as bigint), cast(max_rho as int))")).as("sum_filled"))
    val raw = lit(Alpha) * M * M / (col("sum_filled") + (lit(M) - col("n_filled")))
    val est =
      if (!corrected) raw
      else {
        val zeros = lit(M) - col("n_filled")
        when(raw <= 2.5 * M && zeros > 0, lit(M.toDouble) * log(lit(M.toDouble) / zeros))
          .otherwise(raw)
      }
    base.select((groupCols.map(col) :+ col("n_filled") :+ est.as("est_distinct")): _*)
  }

  /** One-call convenience: group → (n_filled, est_distinct). */
  def approxDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      corrected: Boolean = true
  ): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, valueCol), groupCols, corrected)

  /** Union of register tables (same group/value definition over
    * disjoint or overlapping row sets): max per (group, bucket).
    * This is the pre-aggregation scale path — persist per-partition /
    * per-day register tables (m rows per group each), merge and
    * estimate at query time without rescanning history. Exactly
    * equivalent to sketching the concatenated input: max is
    * associative/commutative and register state is insertion-order
    * free (OperatorsSpec proves merge(A,B) == sketch(A ∪ B)).
    */
  def mergeRegisters(groupCols: Seq[String], registerTables: DataFrame*): DataFrame = {
    require(registerTables.nonEmpty, "need at least one register table")
    registerTables
      .reduce(_ unionByName _)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max("max_rho").as("max_rho"))
  }
}
