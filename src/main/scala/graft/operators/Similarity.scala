package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor operators over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast cross join. The
  * inner product is UNROLLED over the (schema-known) dimension into
  * `a[1]*b[1] + … + a[d]*b[d]`, which whole-stage codegen compiles to
  * straight-line arithmetic; higher-order functions (`aggregate`/
  * `zip_with`) do not participate in codegen and cost an order of
  * magnitude more per pair. Norms are computed once per ROW before the
  * join, not once per pair.
  *
  * Scale path: random-hyperplane LSH bucketing — per-row signature,
  * one shuffle on the bucket key, exact rescoring only within buckets.
  */
object Similarity {

  /** Cosine similarity via higher-order functions — dimension-generic
    * form for ad-hoc use. Hot paths use [[dotUnrolled]].
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    val denom = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0d))
  }

  /** Codegen-friendly inner product for a fixed dimension: left-to-
    * right sum, same association order as a sequential fold (keeps
    * cross-engine rounding identical).
    */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i => element_at(a, i) * element_at(b, i)).reduce(_ + _)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Vector length probed from the data (one tiny action) when the
    * caller doesn't pass it.
    */
  private def probeDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

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
      roundTo: Int = 4,
      dim: Int = -1
  ): DataFrame = {
    val d = if (dim > 0) dim else probeDim(corpus, vecCol)
    def side(df: DataFrame, id: String, v: String) =
      df.select(col(idCol).as(id), asDouble(col(vecCol)).as(v))
        .withColumn(s"${v}_norm", sqrt(dotUnrolled(col(v), col(v), d)))
    // constant-key broadcast hash join: unlike crossJoin's
    // BroadcastNestedLoopJoin, BHJ evaluates filters/conditions inside
    // whole-stage codegen — the all-pairs loop stays compiled
    val c = side(corpus, "corpus_id", "cv").withColumn("__k", lit(1))
    val q = side(queries, "query_id", "qv").withColumn("__k", lit(1))
    val scored = c
      .join(broadcast(q), Seq("__k"))
      .drop("__k")
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn(
        "sim",
        round(dotUnrolled(col("cv"), col("qv"), d) / (col("cv_norm") * col("qv_norm")), roundTo)
      )
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("corpus_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
  }

  /** Exact all-pairs cosine above a threshold — the dense numeric
    * kernel done as `mapPartitions` over primitive double arrays
    * against a broadcast of the (normalized) corpus matrix. This is
    * the one operator family where imperative per-partition code beats
    * every declarative encoding: an unrolled-expression Project runs
    * interpreted once the 64-term tree exceeds codegen limits
    * (measured 40 s for 2M pairs at sf0.1; this kernel: < 1 s).
    *
    * Scale path: the broadcast side is one BLOCK of the corpus; tile
    * over blocks for matrices beyond executor memory (outer loop =
    * one broadcast per block), keeping O(rows × blockSize) work per
    * task and no shuffle.
    *
    * Rounding matches `functions.round` (HALF_UP at `roundTo`), so
    * results are bit-identical to the declarative form and the DuckDB
    * oracle.
    */
  def cosinePairsKernel(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      roundTo: Int = 4
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
    val mat = base.collect().sortBy(_._1).map { case (id, v) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      (id, v, math.sqrt(s))
    }
    val bc = spark.sparkContext.broadcast(mat)
    val scale = roundTo
    base.mapPartitions { rows =>
      val m = bc.value
      rows.flatMap { case (idA, va) =>
        var na = 0.0; var i = 0
        while (i < va.length) { na += va(i) * va(i); i += 1 }
        val nA = math.sqrt(na)
        // primitive-math prefilter: HALF_UP(x, s) >= t iff
        // x >= t - 0.5*10^-s, so only near/above-threshold pairs pay
        // the BigDecimal rounding (2M allocations otherwise)
        val rawCut = threshold - 0.5 * math.pow(10, -scale) - 1e-12
        m.iterator.filter(_._1 > idA).flatMap { case (idB, vb, nB) =>
          var dot = 0.0; var j = 0
          while (j < va.length) { dot += va(j) * vb(j); j += 1 }
          val raw = dot / (nA * nB)
          if (raw < rawCut) None
          else {
            val sim = BigDecimal(raw)
              .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (sim >= threshold) Some((idA, idB, sim)) else None
          }
        }
      }
    }.toDF("id_a", "id_b", "sim")
  }

  /** Top-k cosine neighbors via the same broadcast-matrix kernel as
    * [[cosinePairsKernel]]: per query row, one pass over the corpus
    * block maintaining a bounded top-k ordered by
    * (rounded sim desc, corpus_id asc) — identical ranking semantics
    * to the declarative window form (and the SQL oracle).
    */
  def cosineKnnKernel(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      roundTo: Int = 4
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def prep(df: DataFrame) =
      df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
        .as[(Long, Array[Double])]
    val mat = prep(corpus).collect().sortBy(_._1).map { case (id, v) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      (id, v, math.sqrt(s))
    }
    val bc = spark.sparkContext.broadcast(mat)
    val scale = roundTo
    prep(queries).mapPartitions { rows =>
      val m = bc.value
      rows.flatMap { case (qid, qv) =>
        var nq = 0.0; var i = 0
        while (i < qv.length) { nq += qv(i) * qv(i); i += 1 }
        val nQ = math.sqrt(nq)
        // (negSim, corpusId) sorts best-first with the id tiebreak;
        // sorting the block's scores is fine per-block (bounded size)
        val scored = new scala.collection.mutable.ArrayBuffer[(Double, Long)](m.length)
        m.foreach { case (cid, cv, nC) =>
          if (cid != qid) {
            var dot = 0.0; var j = 0
            while (j < qv.length) { dot += qv(j) * cv(j); j += 1 }
            val sim = BigDecimal(dot / (nQ * nC))
              .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
            scored += ((-sim, cid))
          }
        }
        scored.sorted.take(k).zipWithIndex.map { case ((negSim, cid), idx) =>
          (qid, cid, -negSim, idx + 1)
        }
      }
    }.toDF("query_id", "corpus_id", "sim", "rank")
  }

  /** Random-hyperplane signature: bit j = sign(dot(v, r_j)) where r_j
    * is a deterministic pseudo-random ±1 hyperplane. The hyperplanes
    * depend only on (seed, bit, dim) — they are precomputed
    * driver-side into literal ±1 arrays, so the per-row work is
    * `bits` fused multiply-fold passes with no hashing.
    *
    * `dim` bounds the hyperplane length; vectors longer than `dim`
    * ignore the tail (pass the true dimension).
    */
  /** The deterministic ±1 hyperplane for (seed, bit): public so the
    * DuckDB oracle SQL embeds the identical literals.
    */
  def hyperplaneSigns(bits: Int, seed: Int, dim: Int): Seq[Seq[Double]] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until bits).map { j =>
      (0 until dim).map { i =>
        if (mix(seed.toLong << 40 | j.toLong << 20 | i.toLong) % 2 == 0) 1.0 else -1.0
      }
    }
  }

  def hyperplaneSignature(vec: Column, bits: Int, seed: Int = 0, dim: Int = 64): Column = {
    val v = asDouble(vec)
    val planes = hyperplaneSigns(bits, seed, dim)
    val bitCols = (0 until bits).map { j =>
      val signs = array(planes(j).map(lit): _*)
      // coalesce: zip_with null-pads when vector length != dim; the
      // unmatched tail contributes 0 to the dot product
      val s = aggregate(
        zip_with(v, signs, (x, sg) => coalesce(x * sg, lit(0.0d))),
        lit(0.0d), (acc, x) => acc + x)
      when(s >= 0, call_function("shiftleft", lit(1L), lit(j))).otherwise(lit(0L))
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
      roundTo: Int = 4,
      dim: Int = -1
  ): DataFrame = {
    // vectors + norms materialized once; candidate discovery joins
    // NARROW (id, table_id, bucket) rows — the d-dim vectors do not
    // travel through the self-join shuffle, they are re-fetched only
    // for the (much smaller) candidate set when rescoring.
    // norm + signature + rescoring dot all run through the native
    // VectorKernels loops (bit-identical to the HOF/unrolled forms
    // they replaced — the ss02 oracle still replays them exactly);
    // the HOF signature fold alone was ~60% of this operator's time.
    import graft.functions.VectorKernels
    val base = corpus
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("v_norm", sqrt(VectorKernels.vecDot(col("v"), col("v"))))
      .localCheckpoint()
    // per-table hyperplane seeds decorrelate the tables; a vector
    // lands in one bucket per table
    val buckets = (0 until tables).map { t =>
      base.select(col("id"), lit(t).as("table_id"),
        VectorKernels.hyperplaneSig(col("v"), bits, seed = t).as("bucket"))
    }.reduce(_ union _)
    val cand = buckets.alias("a")
      .join(buckets.alias("b"),
        col("a.table_id") === col("b.table_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("corpus_id"))
      .distinct()
    val pairs = cand
      .join(base.select(col("id").as("query_id"), col("v").as("qv"), col("v_norm").as("qn")), "query_id")
      .join(base.select(col("id").as("corpus_id"), col("v").as("cv"), col("v_norm").as("cn")), "corpus_id")
      .select(
        col("query_id"), col("corpus_id"),
        round(graft.functions.VectorKernels.vecDot(col("qv"), col("cv")) /
          (col("qn") * col("cn")), roundTo).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("corpus_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
  }

  /** Scalar int8 quantization of an embedding (4×–8× storage cut for
    * ANN corpora — the standard compression lever before PQ):
    * per-vector absmax scale, q_i = round(x_i·127/amax). Every step is
    * plain IEEE arithmetic in a fixed association order, so the DuckDB
    * oracle replays scale, codes, and reconstruction error exactly.
    *
    * @return (scale, quantized codes as array<double> of integral
    *         values, squared reconstruction error folded left from
    *         0.0)
    */
  def int8Quantize(vec: Column): (Column, Column, Column) = {
    val v = transform(vec, _.cast("double"))
    val amax = array_max(transform(v, x => abs(x)))
    val q = transform(v, x => when(amax > 0, round(x * 127.0 / amax)).otherwise(lit(0.0)))
    val dq = transform(q, c => c * amax / 127.0)
    val err = aggregate(
      zip_with(v, dq, (x, d) => (x - d) * (x - d)), lit(0.0d), (acc, e) => acc + e)
    (amax.as("scale"), q, err)
  }

  /** Semantic deduplication (the SemDeDup shape, Abbas et al. 2023):
    * k-means-cluster the embeddings, then compare pairs ONLY within a
    * cluster — ~1/k of the all-pairs cost, and the scale path is an
    * equi-join on cluster_id (shuffle co-locates each cluster; no
    * broadcast of the corpus). A row is removed when some smaller-id
    * member of its cluster is within `threshold` cosine; the smallest
    * such id is the keeper. Norms are computed once per row before
    * the join, so the quadratic step pays one dot product per pair.
    */
  def semanticDedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      threshold: Double,
      roundTo: Int = 4
  ): DataFrame = {
    val model = Ivf.train(corpus, idCol, vecCol, k, iters)
    val indexed = Ivf.index(corpus, idCol, vecCol, model)
      .select(col("cluster_id"), col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("nrm",
        sqrt(graft.functions.VectorKernels.vecDot(col("v"), col("v"))))
      .localCheckpoint() // Lloyd already ran; feed both join sides from the materialized index
    val a = indexed.select(col("cluster_id"), col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = indexed.select(col("cluster_id"), col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("cluster_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim",
        round(graft.functions.VectorKernels.vecDot(col("va"), col("vb")) /
          (col("na") * col("nb")), roundTo))
      .filter(col("sim") >= threshold)
      .groupBy(col("id_b").as("removed_id"))
      .agg(min("id_a").as("kept_id"), max("sim").as("max_sim"), count(lit(1)).as("n_dups"))
  }
}
