package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor operators over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast cross join whose
  * inner product runs as higher-order functions inside codegen. Cost
  * is O(N·Q·d) FLOPs; correct at any scale where the QUERY side is
  * broadcastable.
  *
  * Scale path: random-hyperplane LSH bucketing — per-row signature
  * (zero shuffle), one shuffle on the bucket key, exact rescoring only
  * within buckets. Recall tunable via bits/tables; verified against
  * the brute-force baseline in SimilaritySpec.
  */
object Similarity {

  /** Cosine similarity of two array<double> columns as one fused
    * expression: dot / (|a| |b|), null-safe for zero vectors.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    val denom = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0d))
  }

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Brute-force top-k cosine neighbors for every vector in `queries`
    * against `corpus`. `queries` is broadcast (the small side by
    * contract); ranking is deterministic: (rounded sim desc, id asc).
    * Rounding to `roundTo` decimals makes cross-engine rank ties
    * stable — float reduction order differs between engines.
    */
  def bruteForceKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      roundTo: Int = 4
  ): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c
      .crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("cv"), col("qv")), roundTo))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("corpus_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
  }

  /** Random-hyperplane signature: bit j = sign(dot(v, r_j)) where r_j
    * is a deterministic pseudo-random ±1 hyperplane derived from
    * xxhash64(j, i). Per-row compute only.
    */
  def hyperplaneSignature(vec: Column, bits: Int, seed: Int = 0): Column = {
    val v = asDouble(vec)
    val dims = size(v)
    val bitCols = (0 until bits).map { j =>
      // dot(v, r_j) with r_j[i] = ±1 from a hash of (seed, j, i)
      val s = aggregate(
        zip_with(v, sequence(lit(0), dims - 1),
          (x, i) => when(pmod(xxhash64(lit(seed), lit(j), i), lit(2)) === 0, x).otherwise(-x)),
        lit(0.0d),
        (acc, x) => acc + x
      )
      when(s >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: group vectors by signature bucket, rescore
    * exactly within buckets. One shuffle on the 8-byte bucket key.
    * Multi-probe via `tables` independent signatures.
    */
  def lshKnn(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 12,
      tables: Int = 4,
      roundTo: Int = 4
  ): DataFrame = {
    val base = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    // per-table hyperplane seeds decorrelate the tables; a vector lands
    // in one bucket per table, so probe cost is `tables` bucket scans
    val tabled = (0 until tables).map { t =>
      base.withColumn("table_id", lit(t))
        .withColumn("bucket", hyperplaneSignature(col("v"), bits, seed = t))
    }.reduce(_ union _)
    val a = tabled.alias("a")
    val b = tabled.alias("b")
    val pairs = a
      .join(b,
        col("a.table_id") === col("b.table_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("corpus_id"),
        col("a.v").as("qv"), col("b.v").as("cv"))
      .distinct()
      .withColumn("sim", round(cosine(col("qv"), col("cv")), roundTo))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("corpus_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
  }
}
