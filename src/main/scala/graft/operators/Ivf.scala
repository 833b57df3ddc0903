package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer assigns every vector to its nearest centroid; search
  * probes only the `nprobe` closest clusters and rescores exactly
  * inside them. The standard beyond-LSH scale path (FAISS-style IVF
  * flat, re-expressed on Spark):
  *
  *  - training: Lloyd's iterations as distributed assign (broadcast
  *    centroids, mapPartitions kernel) + per-cluster mean (posexplode
  *    → groupBy (cluster, dim) average — one shuffle of k×d cells);
  *  - index: one `cluster_id` column on the corpus — at scale the
  *    corpus is then REPARTITIONED/persisted by cluster_id, so a probe
  *    reads only its clusters' partitions;
  *  - search: per query, nearest `nprobe` centroids → exact cosine
  *    over those clusters' members only (≈ nprobe/k of the corpus).
  */
object Ivf {

  final case class Model(centroids: Array[Array[Double]]) {
    def nearest(v: Array[Double], n: Int): Seq[Int] =
      centroids.indices
        .map(i => (dist2(centroids(i), v), i))
        .sorted.take(n).map(_._2)
  }

  private def dist2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def toVec(df: DataFrame, idCol: String, vecCol: String) = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
  }

  /** Lloyd's k-means. Init = the k vectors with smallest ids
    * (deterministic); each iteration is one broadcast-assign pass and
    * one (cluster, dim)-cell aggregation. With the decimal-exact mean
    * reduction below, the trained centroids are bit-identical across
    * runs and partitionings — reproducible index builds.
    *
    * Driver-memory bound (100 TB note): the init `orderBy(id).take(k)`
    * plans as a distributed TakeOrdered (per-partition top-k, merge of
    * k rows — NOT a global sort), and every iteration collects only the
    * k×d `(cluster, dim, mean)` cells — both are sized by the MODEL
    * (k×d doubles, e.g. 65536×768 ≈ 400 MB at the extreme end), never
    * by the corpus. Corpus rows are touched only inside executors. A
    * sampled init (k-means‖) would cut nothing here: the bound is the
    * model transfer, which any init shape pays; the id-ordered form
    * buys bit-reproducibility, which the ss03/ss06/ss07/ss08 oracles
    * replay.
    */
  def train(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 5
  ): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val data = toVec(df, idCol, vecCol)
    var centroids = data.orderBy(col(idCol)).take(k).map(_._2)
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val assigned = data.mapPartitions { rows =>
        val cs = bc.value
        rows.map { case (_, v) =>
          var best = 0; var bestD = Double.MaxValue; var i = 0
          while (i < cs.length) {
            val d = dist2(cs(i), v); if (d < bestD) { bestD = d; best = i }; i += 1
          }
          (best, v)
        }
      }
      // per-cluster mean via (cluster, dim) cells — k×d aggregation.
      // The sum goes through per-value DECIMAL(28,14) casts: each cast
      // rounds deterministically, decimal addition is exact, so the
      // centroid bits are independent of partitioning/reduction order
      // — training is REPRODUCIBLE (a plain double avg() varies with
      // partial-aggregation order).
      val means = assigned
        .flatMap { case (c, v) => v.indices.map(i => (c, i, v(i))) }
        .toDF("c", "i", "x")
        .groupBy("c", "i")
        .agg((sum(col("x").cast("decimal(28,14)")).cast("double") / count(lit(1))).as("m"))
        .collect()
      val byCluster = means.groupBy(_.getInt(0))
      centroids = centroids.indices.map { c =>
        byCluster.get(c) match {
          case Some(cells) =>
            val arr = new Array[Double](centroids(c).length)
            cells.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            arr
          case None => centroids(c) // empty cluster keeps its centroid
        }
      }.toArray
    }
    Model(centroids)
  }

  /** Stamp each corpus row with its cluster. At scale, follow with
    * `.repartition(col("cluster_id"))` + persist so probes are
    * partition-local reads.
    */
  def index(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.centroids)
    toVec(df, idCol, vecCol).mapPartitions { rows =>
      val cs = bc.value
      rows.map { case (id, v) =>
        var best = 0; var bestD = Double.MaxValue; var i = 0
        while (i < cs.length) {
          val d = dist2(cs(i), v); if (d < bestD) { bestD = d; best = i }; i += 1
        }
        (id, v, best)
      }
    }.toDF(idCol, vecCol, "cluster_id")
  }

  /** Persist the indexed corpus as parquet PARTITIONED BY cluster_id —
    * the stored form of the scaladoc note on [[index]]: one directory
    * per cluster, so a probe search over the stored index reads only
    * the probed clusters' files. `repartition(cluster_id)` first, so
    * each cluster's rows land in few files instead of every task
    * writing a sliver into every partition directory.
    */
  def writeIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      path: String
  ): Unit =
    index(df, idCol, vecCol, model)
      .repartition(col("cluster_id"))
      .write.mode("overwrite").partitionBy("cluster_id").parquet(path)

  /** Incremental index maintenance: assign a NEW embedding batch to the
    * EXISTING centroids and append it under the same cluster_id
    * partition layout — no re-clustering, no rewrite of the stored
    * corpus (at 100 TB a daily feed cannot re-run Lloyd over
    * everything; FAISS-style IVF lists grow the same way). Every
    * [[searchStored]] probe sees appended rows immediately because the
    * partition filter is directory-based. Centroid drift is the
    * operator's documented trade: retrain + full [[writeIndex]] on a
    * maintenance cadence, not per batch.
    *
    * After the append, small-file debt is compacted once the index
    * exceeds `maxFiles` parquet files (same trigger contract as
    * [[Dedup.maybeCompactIndexes]]); compaction preserves the
    * cluster_id partition layout, so pruning is untouched. Returns
    * true when a compaction ran.
    */
  def appendToIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      path: String,
      maxFiles: Long = 256L
  ): Boolean = {
    val spark = df.sparkSession
    index(df, idCol, vecCol, model)
      .repartition(col("cluster_id"))
      .write.mode("append").partitionBy("cluster_id").parquet(path)
    if (graft.ops.Maintenance.parquetFileCount(spark, path) > maxFiles) {
      graft.ops.Maintenance.compact(spark, path,
        partitionCols = Seq("cluster_id"))
      true
    } else false
  }

  /** Search over a [[writeIndex]]-stored index with STATIC probe-cluster
    * partition pruning: the probed cluster set is computed from the
    * query vectors (the small side by contract — same bound as the
    * centroid model itself) and pushed as a `cluster_id IN (...)`
    * partition filter, so the parquet scan lists and reads ONLY the
    * probed clusters' directories — ≈ nprobe/k of a 100 TB corpus —
    * before the same equi-join rescore as [[search]]. Results are
    * bit-identical to [[search]] over the unstored index.
    */
  def searchStored(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      k: Int,
      nprobe: Int,
      roundTo: Int = 4
  ): DataFrame = {
    val probed = toVec(queries, idCol, vecCol).collect()
      .flatMap { case (_, qv) => model.nearest(qv, nprobe) }
      .distinct.sorted
    val stored = spark.read.parquet(path)
      .filter(col("cluster_id").isin(probed.map(Int.box): _*))
    search(stored, queries, idCol, vecCol, model, k, nprobe, roundTo)
  }

  /** Probe search: top-k cosine among the members of each query's
    * `nprobe` nearest clusters. Ranking/rounding matches the exact
    * kernels: (rounded sim desc, id asc).
    *
    * Scale shape: the corpus NEVER leaves the executors — each query
    * is replicated to its `nprobe` probe clusters (queries are the
    * small side by contract) and candidates come from an EQUI-JOIN on
    * `cluster_id`, so the shuffle co-locates each cluster's members
    * with exactly the queries probing it (and with the corpus stored
    * partitioned by cluster_id, the scan side prunes to the probed
    * partitions). Only the k×d centroid model is broadcast. The dot/
    * norm arithmetic runs in the native [[graft.functions
    * .VectorKernels]] loops, whose fold order and `round` HALF_UP are
    * bit-identical to the previous imperative kernel and the oracle.
    */
  def search(
      indexed: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      k: Int,
      nprobe: Int,
      roundTo: Int = 4
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorKernels
    val spark = indexed.sparkSession
    import spark.implicits._
    val bcModel = spark.sparkContext.broadcast(model)
    val probes = toVec(queries, idCol, vecCol)
      .flatMap { case (qid, qv) =>
        bcModel.value.nearest(qv, nprobe).map(c => (qid, c, qv))
      }
      .toDF("query_id", "cluster_id", "qv")
      .withColumn("qn", sqrt(VectorKernels.vecDot(col("qv"), col("qv"))))
    val members = indexed.select(
      col(idCol).cast("long").as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"),
      col("cluster_id"))
      .withColumn("cn", sqrt(VectorKernels.vecDot(col("cv"), col("cv"))))
    val pairs = probes
      .join(members, "cluster_id")
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        round(VectorKernels.vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")), roundTo)
          .as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("corpus_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
  }

  /** IVF + SQ8 composed search (FAISS `IndexIVFScalarQuantizer` with a
    * refine step): the coarse probes bound the scan to nprobe/k of the
    * corpus via the same cluster_id equi-join as [[search]], the
    * within-cluster ranking runs in the SQ8 compressed domain (byte
    * codes + precomputed reconstructed norms — the scan never touches
    * raw vectors), and only the per-query `shortlist` survivors pay an
    * id equi-join back to exact vectors for the final rounded-cosine
    * rerank. Both rankings round before ordering with an id tiebreak,
    * so the DuckDB oracle replays coarse Lloyd + quantization + both
    * rankings bit for bit.
    */
  def searchSq8(
      indexed: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      mn: Array[Double],
      step: Array[Double],
      shortlist: Int,
      k: Int,
      nprobe: Int,
      roundTo: Int = 4
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorKernels
    val spark = indexed.sparkSession
    import spark.implicits._
    val bcModel = spark.sparkContext.broadcast(model)
    val probes = toVec(queries, idCol, vecCol)
      .flatMap { case (qid, qv) =>
        bcModel.value.nearest(qv, nprobe).map(c => (qid, c))
      }
      .toDF("query_id", "cluster_id")
      .join(Similarity.sq8Queries(queries, idCol, vecCol, mn, step)
        .drop("qv"), "query_id")
    val mnL = lit(mn)
    val stepL = lit(step)
    val codes =
      VectorKernels.sq8Pack(transform(col(vecCol), _.cast("double")), mnL, stepL)
    val dq = VectorKernels.sq8Dequant(col("codes"), mnL, stepL)
    val members = indexed
      .select(col(idCol).cast("long").as("corpus_id"), col("cluster_id"), codes.as("codes"))
      .withColumn("dqn", sqrt(VectorKernels.vecDot(dq, dq)))
    // Shortlist window shuffles ONLY (query_id, corpus_id, adc); qv/qn
    // re-join from the (small, per-query) probe frame after the filter.
    val pairs = probes
      .join(members, "cluster_id")
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        round((col("qmin") + VectorKernels.sq8Adc(col("qw"), col("codes"))) /
          (col("qn") * col("dqn")), roundTo).as("adc"))
    val wAdc = Window.partitionBy("query_id").orderBy(desc("adc"), asc("corpus_id"))
    val cand = pairs
      .withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= shortlist)
      .drop("rn")
    val exact = corpus.select(
      col(idCol).cast("long").as("corpus_id"),
      transform(col(vecCol), _.cast("double")).as("cv"))
      .withColumn("cn", sqrt(VectorKernels.vecDot(col("cv"), col("cv"))))
    val qSlim = Similarity.sq8Queries(queries, idCol, vecCol, mn, step)
      .select(col("query_id"), col("qv"), col("qn"))
    val resc = broadcast(cand)
      .join(exact, "corpus_id")
      .join(broadcast(qSlim), "query_id")
      .select(col("query_id"), col("corpus_id"), col("adc"),
        round(VectorKernels.vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")), roundTo)
          .as("sim"))
    val wSim = Window.partitionBy("query_id").orderBy(desc("sim"), asc("corpus_id"))
    resc
      .withColumn("rank", row_number().over(wSim))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "adc", "sim", "rank")
  }
}
