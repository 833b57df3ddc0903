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

  /** Deterministic block id for a vector id: non-negative `id mod B`.
    * Blocking by id (not by partition) keeps the assignment stable
    * across partitionings, which is what makes blocked == unblocked
    * results bit-identical and partition-invariant.
    */
  private def blockOf(id: Long, nBlocks: Int): Int =
    (((id % nBlocks) + nBlocks) % nBlocks).toInt

  /** Default block count: ~sqrt(2 × parallelism) blocks gives
    * B(B+1)/2 ≳ parallelism block-pair tasks, enough to fill the
    * cluster. At real scale callers pass nBlocks explicitly so one
    * block (corpus/B rows × dim doubles) fits task memory.
    */
  private def defaultBlocks(df: DataFrame): Int =
    math.max(2, math.ceil(math.sqrt(2.0 * df.sparkSession.sparkContext.defaultParallelism)).toInt)

  private def l2(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  /** Exact all-pairs cosine above a threshold — the dense numeric
    * kernel as a BLOCK-PAIR shuffle over primitive double arrays. The
    * corpus is split into `nBlocks` deterministic blocks (id mod B);
    * each row is shuffled to every block-pair group (p, q) its block
    * participates in, and each group runs the tight |P|×|Q| dot-product
    * loop over exactly two blocks. This is the one operator family
    * where imperative per-group code beats every declarative encoding:
    * an unrolled-expression Project runs interpreted once the 64-term
    * tree exceeds codegen limits (measured 40 s for 2M pairs at sf0.1;
    * this kernel: < 1 s).
    *
    * Scale shape: NO driver collect and NO corpus-sized broadcast —
    * per-task memory is two blocks (2 × |corpus|/B rows), shuffle
    * volume is B × |corpus| (disk-backed), parallelism is B(B+1)/2
    * independent tasks. Choose B so a block fits executor memory;
    * everything else follows.
    *
    * Rounding matches `functions.round` (HALF_UP at `roundTo`) and the
    * per-pair arithmetic is identical for every B, so results are
    * bit-identical to the declarative form, the DuckDB oracle, and any
    * other block count.
    */
  def cosinePairsKernel(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      roundTo: Int = 4,
      nBlocks: Int = -1
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val b = if (nBlocks > 0) nBlocks else defaultBlocks(corpus)
    val base = corpus.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
    val scale = roundTo
    // (groupKey = p*B+q, ownBlock, id, vec, norm): each row joins every
    // block-pair its block is a member of — replication factor B
    val replicated = base.flatMap { case (id, v) =>
      val own = blockOf(id, b)
      val n = l2(v)
      (0 until b).iterator.map { other =>
        val p = math.min(own, other); val q = math.max(own, other)
        (p * b + q, own, id, v, n)
      }
    }
    replicated
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val p = key / b; val q = key % b
        val sideP = new scala.collection.mutable.ArrayBuffer[(Long, Array[Double], Double)]
        val sideQ = new scala.collection.mutable.ArrayBuffer[(Long, Array[Double], Double)]
        it.foreach { case (_, own, id, v, n) =>
          if (own == p) sideP += ((id, v, n))
          if (own == q && p != q) sideQ += ((id, v, n))
        }
        val right = if (p == q) sideP else sideQ
        // primitive-math prefilter: HALF_UP(x, s) >= t iff
        // x >= t - 0.5*10^-s, so only near/above-threshold pairs pay
        // the BigDecimal rounding (2M allocations otherwise)
        val rawCut = threshold - 0.5 * math.pow(10, -scale) - 1e-12
        // blocks partition ids, so a cross-block (p != q) pair occurs
        // exactly once in the P×Q loop; within-block (p == q) pairs
        // are kept once via idB > idA. Emitted as (low id, high id);
        // IEEE × is commutative and the j-loop order is fixed, so dot
        // and norms are bit-identical regardless of which side a row
        // landed on (and regardless of B).
        sideP.iterator.flatMap { case (idA, va, nA) =>
          right.iterator.flatMap { case (idB, vb, nB) =>
            if (idB == idA || (p == q && idB < idA)) None
            else {
              var dot = 0.0; var j = 0
              while (j < va.length) { dot += va(j) * vb(j); j += 1 }
              val raw = dot / (nA * nB)
              if (raw < rawCut) None
              else {
                val sim = BigDecimal(raw)
                  .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
                if (sim >= threshold) {
                  val lo = math.min(idA, idB); val hi = math.max(idA, idB)
                  Some((lo, hi, sim))
                } else None
              }
            }
          }
        }
      }
      .toDF("id_a", "id_b", "sim")
  }

  /** Top-k cosine neighbors via the same block-pair shape as
    * [[cosinePairsKernel]]: the corpus is blocked (id mod B), queries
    * are replicated to every corpus block, each (corpus block ×
    * queries) cogroup keeps a per-query local top-k ordered by
    * (rounded sim desc, corpus_id asc), and a final window merges the
    * B×k candidates per query into the global top-k — identical
    * ranking semantics to the declarative window form (and the SQL
    * oracle), because every global top-k member is in its own block's
    * local top-k under the same total order.
    *
    * No driver collect, no corpus-sized broadcast: per-task memory is
    * one corpus block, and only B×k small candidate rows per query
    * reach the merge.
    */
  def cosineKnnKernel(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      roundTo: Int = 4,
      nBlocks: Int = -1
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val b = if (nBlocks > 0) nBlocks else defaultBlocks(corpus)
    def prep(df: DataFrame) =
      df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
        .as[(Long, Array[Double])]
    val scale = roundTo
    val corpusBlocked = prep(corpus).map { case (id, v) => (blockOf(id, b), id, v, l2(v)) }
    val queriesRepl = prep(queries).flatMap { case (id, v) =>
      val n = l2(v)
      (0 until b).iterator.map(blk => (blk, id, v, n))
    }
    val candidates = corpusBlocked
      .groupByKey(_._1)
      .cogroup(queriesRepl.groupByKey(_._1)) { (_, cIt, qIt) =>
        val block = cIt.toArray // ONE corpus block, bounded by |corpus|/B
        // per-query scratch, reused across the block's queries
        val ids = new Array[Long](block.length)
        val raws = new Array[Double](block.length)
        val topRaw = new Array[Double](k)
        val step = math.pow(10, -scale)
        qIt.flatMap { case (_, qid, qv, nQ) =>
          // phase 1: RAW scores only, tracking the k-th largest raw —
          // rounding is monotone and |round(x) − x| ≤ step/2, so any
          // candidate with raw < (kth raw − step) rounds strictly below
          // k candidates and can never reach the rounded top-k; only
          // the survivors pay the BigDecimal rounding (the previous
          // per-pair rounding dominated the whole kernel)
          java.util.Arrays.fill(topRaw, Double.NegativeInfinity)
          var m = 0
          block.foreach { case (_, cid, cv, nC) =>
            if (cid != qid) {
              var dot = 0.0; var j = 0
              while (j < qv.length) { dot += qv(j) * cv(j); j += 1 }
              val raw = dot / (nQ * nC)
              ids(m) = cid; raws(m) = raw; m += 1
              if (raw > topRaw(0)) { // topRaw(0) holds the current min
                topRaw(0) = raw
                var mi = 0; var ii = 1
                while (ii < k) { if (topRaw(ii) < topRaw(mi)) mi = ii; ii += 1 }
                if (mi != 0) {
                  val t = topRaw(0); topRaw(0) = topRaw(mi); topRaw(mi) = t
                }
              }
            }
          }
          val cut =
            if (m >= k) topRaw(0) - step - 1e-12 else Double.NegativeInfinity
          // phase 2: round the handful of survivors, then the same
          // (rounded desc, corpus_id asc) order as before
          val scored = new scala.collection.mutable.ArrayBuffer[(Double, Long)](k + 8)
          var i = 0
          while (i < m) {
            if (raws(i) >= cut) {
              val sim = BigDecimal(raws(i))
                .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
              scored += ((-sim, ids(i)))
            }
            i += 1
          }
          scored.sorted.take(k).map { case (negSim, cid) => (qid, cid, -negSim) }
        }
      }
      .toDF("query_id", "corpus_id", "sim")
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("corpus_id"))
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
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

  /** [[lshKnn]] with deterministic bucket truncation — the bounded-
    * candidate form that survives duplicate-heavy corpora. Each
    * (table, bucket)'s CORPUS side keeps only the `bucketCap` members
    * with the smallest mixed-hash of id (an unbiased, replayable
    * sample of the bucket; ties by id), so per-query candidates are
    * ≤ tables × bucketCap and total candidate volume is LINEAR in
    * corpus size no matter how deep the buckets get. Queries still
    * probe with their own (uncapped) signatures, so every row gets an
    * answer; recall inside a mega-bucket degrades gracefully toward a
    * uniform sample of it — the standard production tradeoff
    * (bounded bucket scan) versus [[lshKnn]]'s exact-within-bucket
    * rescoring that goes quadratic when one bucket holds the corpus.
    */
  def lshKnnCapped(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 12,
      tables: Int = 4,
      bucketCap: Int = 64,
      roundTo: Int = 4
  ): DataFrame = {
    import graft.functions.VectorKernels
    graft.functions.MixedHash64.register(corpus.sparkSession)
    val base = corpus
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("v_norm", sqrt(VectorKernels.vecDot(col("v"), col("v"))))
      .localCheckpoint()
    val buckets = (0 until tables).map { t =>
      base.select(col("id"), lit(t).as("table_id"),
        VectorKernels.hyperplaneSig(col("v"), bits, seed = t).as("bucket"))
    }.reduce(_ union _)
    // the shuffle carries (id, table_id, bucket, hid) — 32 bytes —
    // and one window pass truncates; vectors never enter the cap
    val wB = Window.partitionBy("table_id", "bucket")
      .orderBy(col("hid").asc, col("id").asc)
    val capped = buckets
      .withColumn("hid", graft.functions.MixedHash64(col("id").cast("string")))
      .withColumn("rn", row_number().over(wB))
      .filter(col("rn") <= bucketCap)
      .select("id", "table_id", "bucket")
    val cand = buckets.alias("a")
      .join(capped.alias("b"),
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
        round(VectorKernels.vecDot(col("qv"), col("cv")) /
          (col("qn") * col("cn")), roundTo).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("corpus_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
  }

  /** One-pass bucket-cap SWEEP of [[lshKnnCapped]]: per cap `c`, the
    * returned frame is row-identical to
    * `lshKnnCapped(corpus, …, bucketCap = c).filter(queryPred on query)`
    * — but the corpus is sketched, bucketed, truncated, joined and
    * rescored ONCE at `caps.max` instead of once per cap.
    *
    * Equivalence: a pair (q, c') is in cap c's candidate set iff some
    * shared (table, bucket) holds c' inside c's truncation window,
    * i.e. MIN over shared buckets of rn ≤ c — so one join at the
    * largest cap carrying `min_rn` reconstructs every smaller cap's
    * candidate set by a filter, and the per-query top-k window over
    * that filtered set sees exactly the per-cap run's input. (The
    * DuckDB oracle for ss20 has used this same single-join shape since
    * round 8; this moves the engine to it too — guide §1.2: don't
    * recompute what a previous pass already knows.) `queryPred` is a
    * predicate over the bucket frame's `id` column, applied to the
    * QUERY side before the join: top-k is per-query independent, so
    * pre-filtering queries equals post-filtering results.
    */
  def lshKnnCappedSweep(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int,
      tables: Int,
      caps: Seq[Int],
      queryPred: Column,
      roundTo: Int = 4
  ): Map[Int, DataFrame] = {
    import graft.functions.VectorKernels
    graft.functions.MixedHash64.register(corpus.sparkSession)
    val maxCap = caps.max
    val base = corpus
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("v_norm", sqrt(VectorKernels.vecDot(col("v"), col("v"))))
      .localCheckpoint()
    val buckets = (0 until tables).map { t =>
      base.select(col("id"), lit(t).as("table_id"),
        VectorKernels.hyperplaneSig(col("v"), bits, seed = t).as("bucket"))
    }.reduce(_ union _)
    val wB = Window.partitionBy("table_id", "bucket")
      .orderBy(col("hid").asc, col("id").asc)
    val capped = buckets
      .withColumn("hid", graft.functions.MixedHash64(col("id").cast("string")))
      .withColumn("rn", row_number().over(wB))
      .filter(col("rn") <= maxCap)
      .select("id", "table_id", "bucket", "rn")
    val cand = buckets.filter(queryPred).alias("a")
      .join(capped.alias("b"),
        col("a.table_id") === col("b.table_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("query_id"), col("b.id").as("corpus_id"))
      .agg(min(col("b.rn")).as("min_rn"))
    // rescored once; every cap's top-k reads these materialized rows
    val pairs = cand
      .join(base.select(col("id").as("query_id"), col("v").as("qv"), col("v_norm").as("qn")), "query_id")
      .join(base.select(col("id").as("corpus_id"), col("v").as("cv"), col("v_norm").as("cn")), "corpus_id")
      .select(
        col("query_id"), col("corpus_id"), col("min_rn"),
        round(VectorKernels.vecDot(col("qv"), col("cv")) /
          (col("qn") * col("cn")), roundTo).as("sim"))
      .localCheckpoint()
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("corpus_id"))
    caps.map { c =>
      c -> pairs.filter(col("min_rn") <= c)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("query_id", "corpus_id", "sim", "rank")
    }.toMap
  }

  /** NN-Descent kNN-graph refinement (Dong et al., WWW 2011,
    * "Efficient k-nearest neighbor graph construction for generic
    * similarity measures"): start from ANY approximate kNN edge set
    * (here typically [[lshKnnCapped]]) and repeat "a neighbor of my
    * neighbor is probably my neighbor" — each round rescores every
    * node against its 2-hop neighborhood and keeps the top-`k`.
    * This is the standard production kNN-graph constructor precisely
    * because bounded-candidate LSH alone CANNOT recover a kNN graph
    * on weak-structure embeddings: when the k-th neighbor's cosine is
    * ~0.4, a 8-bit hyperplane table co-buckets it with ~2.5%
    * probability, so hitting edge-recall 0.7 by tables alone needs
    * ~48 tables (measured by tools.GraphSweep: Jaccard ≤ 0.09 over
    * bits ∈ {8,12,16} × tables ∈ {2,4,8}); two descent rounds get
    * there at O(N·k²) candidates per round.
    *
    * Deterministic and oracle-replayable: the symmetrized adjacency is
    * capped at `2k` per node (smallest neighbor ids — bounds hub
    * fan-out, so a round's candidate volume is ≤ N·(2k)² whatever the
    * in-degree skew), candidates rescore with the same rounded cosine
    * as every ANN kernel here, and ties break (sim DESC, id ASC).
    * Scale shape per round: two narrow self-joins on 16-byte edge
    * keys, one rescore join against the vector table by id, one
    * per-query top-k window — nothing quadratic, vectors never ride
    * the shuffle wider than the rescore join needs.
    *
    * @param init approximate kNN edges, columns (query_id, corpus_id)
    * @return (query_id, corpus_id, sim, rank), `rank <= k`, like the
    *         other kNN kernels
    */
  def nnDescentKnn(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      init: DataFrame,
      rounds: Int = 2,
      roundTo: Int = 4
  ): DataFrame = {
    import graft.functions.VectorKernels
    val base = corpus
      .select(col(idCol).cast("long").as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("v_norm", sqrt(VectorKernels.vecDot(col("v"), col("v"))))
      .localCheckpoint()
    var knn = init
      .select(col("query_id").cast("long"), col("corpus_id").cast("long"))
      .localCheckpoint()
    var prevCkpt = knn
    var out: DataFrame = knn.withColumn("sim", lit(null).cast("double"))
      .withColumn("rank", lit(null).cast("int"))
    for (_ <- 1 to rounds) {
      val und = knn
        .select(least(col("query_id"), col("corpus_id")).as("a"),
          greatest(col("query_id"), col("corpus_id")).as("b"))
        .distinct()
      val rawAdj = und.select(col("a").as("x"), col("b").as("y"))
        .union(und.select(col("b").as("x"), col("a").as("y")))
      // cap the symmetric adjacency per node: out-degree is ≤ k by
      // construction but REVERSE degree is unbounded (popular nodes);
      // keeping the 2k smallest neighbor ids bounds every node's
      // 2-hop contribution at (2k)² deterministically
      val wAdj = Window.partitionBy("x").orderBy(asc("y"))
      val adj = rawAdj
        .withColumn("rn", row_number().over(wAdj))
        .filter(col("rn") <= 2 * k)
        .select("x", "y")
      val twoHop = adj.alias("e1")
        .join(adj.alias("e2"), col("e1.y") === col("e2.x"))
        .filter(col("e1.x") =!= col("e2.y"))
        .select(col("e1.x").as("query_id"), col("e2.y").as("corpus_id"))
      val cand = twoHop
        .union(adj.select(col("x").as("query_id"), col("y").as("corpus_id")))
        .distinct()
      val pairs = cand
        .join(base.select(col("id").as("query_id"), col("v").as("qv"), col("v_norm").as("qn")),
          "query_id")
        .join(base.select(col("id").as("corpus_id"), col("v").as("cv"), col("v_norm").as("cn")),
          "corpus_id")
        .select(col("query_id"), col("corpus_id"),
          round(VectorKernels.vecDot(col("qv"), col("cv")) /
            (col("qn") * col("cn")), roundTo).as("sim"))
      val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("corpus_id"))
      val next = pairs
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .localCheckpoint() // keep the iterated plan flat
      Checkpoints.dropBlocks(prevCkpt)
      prevCkpt = next
      knn = next.select("query_id", "corpus_id")
      out = next
    }
    out.select("query_id", "corpus_id", "sim", "rank")
  }

  /** Multi-probe LSH ANN (Lv et al., VLDB 2007): instead of paying for
    * more hash tables, each query ALSO probes the buckets reached by
    * flipping each single signature bit — one table + (bits+1) probes
    * buys the recall that plain LSH needs several whole index copies
    * for, at 1/tables the index memory. The corpus is bucketed ONCE;
    * only the query side fans out, and what fans out is the NARROW
    * (id, table, bucket) row — ×(bits+1) on 24-byte keys, never on
    * vectors. Candidates then rescore exactly like [[lshKnn]].
    */
  def lshKnnMultiProbe(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 12,
      tables: Int = 1,
      roundTo: Int = 4,
      bucketCap: Int = Int.MaxValue
  ): DataFrame = {
    import graft.functions.VectorKernels
    val base = corpus
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("v_norm", sqrt(VectorKernels.vecDot(col("v"), col("v"))))
      .localCheckpoint()
    val buckets = (0 until tables).map { t =>
      base.select(col("id"), lit(t).as("table_id"),
        VectorKernels.hyperplaneSig(col("v"), bits, seed = t).as("bucket"))
    }.reduce(_ union _)
    // bounded-bucket variant (same contract as [[lshKnnCapped]]): the
    // CORPUS side of each (table, bucket) keeps only the bucketCap
    // members with the smallest mixed-hash of id, so the probe join is
    // ≤ (bits+1) × tables × cap candidates per query — linear however
    // deep the buckets get. Int.MaxValue (the default) bypasses the
    // truncation window entirely: ss16's uncapped plan is unchanged.
    val corpusSide =
      if (bucketCap == Int.MaxValue) buckets
      else {
        graft.functions.MixedHash64.register(corpus.sparkSession)
        val wB = Window.partitionBy("table_id", "bucket")
          .orderBy(col("hid").asc, col("id").asc)
        buckets
          .withColumn("hid", graft.functions.MixedHash64(col("id").cast("string")))
          .withColumn("rn", row_number().over(wB))
          .filter(col("rn") <= bucketCap)
          .select("id", "table_id", "bucket")
      }
    // identity probe + one per flipped bit
    val probeSet = array(
      col("bucket") +: (0 until bits).map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*)
    val probes = buckets.select(col("id"), col("table_id"),
      explode(probeSet).as("bucket"))
    val cand = probes.alias("a")
      .join(corpusSide.alias("b"),
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
        round(VectorKernels.vecDot(col("qv"), col("cv")) /
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

  /** SQ8 scalar-quantizer training: per-DIMENSION (min, step) affine
    * params over the corpus, step_d = (max_d − min_d)/255 — the FAISS
    * `ScalarQuantizer QT_8bit` shape (vs [[int8Quantize]]'s per-VECTOR
    * absmax, which compresses values but cannot serve a shared
    * compressed-domain scan). Min/max are exact (no summation), so the
    * 64-row result is deterministic under any partitioning; it is the
    * k×2-double control plane of the index, same contract as the
    * IVF/PQ codebook collects.
    */
  def sq8Train(corpus: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val stats = corpus
      .select(posexplode(transform(col(vecCol), _.cast("double"))).as(Seq("i", "x")))
      .groupBy("i").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("i")
      .collect()
    val mn = stats.map(_.getDouble(1))
    val step = stats.map { r =>
      val d = r.getDouble(2) - r.getDouble(1)
      if (d > 0) d / 255.0 else 0.0
    }
    (mn, step)
  }

  /** SQ8 compressed-domain columns for a corpus frame: packed byte
    * codes (8× smaller than the float64 vectors — the column the scan
    * reads) plus the reconstructed norm, computed ONCE per row at
    * index-build time so the per-pair scan work is a single
    * [[graft.functions.VectorKernels.Sq8AdcExpr]] fold over bytes.
    */
  def sq8Index(corpus: DataFrame, idCol: String, vecCol: String,
      mn: Array[Double], step: Array[Double]): DataFrame = {
    import graft.functions.VectorKernels
    val mnL = lit(mn)
    val stepL = lit(step)
    val codes = VectorKernels.sq8Pack(transform(col(vecCol), _.cast("double")), mnL, stepL)
    val withCodes = corpus.select(col(idCol).cast("long").as("corpus_id"), codes.as("codes"))
    val dq = VectorKernels.sq8Dequant(col("codes"), mnL, stepL)
    withCodes.withColumn("dqn", sqrt(VectorKernels.vecDot(dq, dq)))
  }

  /** Query-side SQ8 prep: the asymmetric-distance decomposition
    * ⟨qv, dequant(codes)⟩ = ⟨qv, mn⟩ + Σ_d (qv_d·step_d)·code_d, so
    * each query carries a constant `qmin`, a weight vector `qw`, and
    * its own norm — all computed once per query row.
    */
  private[operators] def sq8Queries(queries: DataFrame, idCol: String, vecCol: String,
      mn: Array[Double], step: Array[Double]): DataFrame = {
    import graft.functions.VectorKernels
    val qv = transform(col(vecCol), _.cast("double"))
    queries.select(
      col(idCol).cast("long").as("query_id"),
      qv.as("qv"),
      zip_with(qv, lit(step), (x, s) => x * s).as("qw"),
      VectorKernels.vecDot(qv, lit(mn)).as("qmin"),
      sqrt(VectorKernels.vecDot(qv, qv)).as("qn"))
  }

  /** SQ8 flat search + exact rerank (FAISS `IndexScalarQuantizer` with
    * a refine step): the full scan ranks candidates by the rounded
    * ADC cosine IN THE COMPRESSED DOMAIN — at 100 TB the scan reads
    * the 8×-smaller byte-code column, never the raw vectors — takes
    * the top `shortlist` per query, then ONE id equi-join refetches
    * exact vectors for only those candidates and reranks by exact
    * rounded cosine. Queries are the broadcast side by contract;
    * ranking rounds to `roundTo` before ordering with an id tiebreak,
    * so both stages replay deterministically in DuckDB.
    */
  def sq8Knn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      mn: Array[Double],
      step: Array[Double],
      shortlist: Int,
      k: Int,
      roundTo: Int = 4
  ): DataFrame = {
    import graft.functions.VectorKernels
    val indexed = sq8Index(corpus, idCol, vecCol, mn, step)
    val q = sq8Queries(queries, idCol, vecCol, mn, step)
    // The shortlist window shuffles ONLY (query_id, corpus_id, adc) — the
    // 64-double qv/qn are re-joined from the broadcast query frame after
    // the top-`shortlist` filter, so the ranking shuffle stays narrower
    // than the byte-code column the scan was compressed to read.
    val pairs = indexed
      .crossJoin(broadcast(q))
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
    val resc = broadcast(cand)
      .join(exact, "corpus_id")
      .join(broadcast(q.select(col("query_id"), col("qv"), col("qn"))), "query_id")
      .select(col("query_id"), col("corpus_id"), col("adc"),
        round(VectorKernels.vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")), roundTo)
          .as("sim"))
    val wSim = Window.partitionBy("query_id").orderBy(desc("sim"), asc("corpus_id"))
    resc
      .withColumn("rank", row_number().over(wSim))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "adc", "sim", "rank")
  }

  /** Binary-quantization training: per-dimension thresholds = the
    * corpus means, summed through per-value DECIMAL(28,14) casts so
    * the 64 doubles are bit-identical under any partitioning (the
    * Lloyd-mean contract from [[Ivf.train]]).
    */
  def bqTrain(corpus: DataFrame, vecCol: String): Array[Double] =
    corpus
      .select(posexplode(transform(col(vecCol), _.cast("double"))).as(Seq("i", "x")))
      .groupBy("i")
      .agg((sum(col("x").cast("decimal(28,14)")).cast("double") / count(lit(1))).as("t"))
      .orderBy("i")
      .collect()
      .map(_.getDouble(1))

  /** Binary-quantization search + exact rerank (the 1-bit ANN family —
    * sign codes around the per-dimension mean): a 64-dim embedding
    * becomes ONE long, candidates rank by Hamming distance (xor +
    * bit_count — codegen'd built-ins over an 8-byte column, 64× less
    * scan I/O than raw vectors), and only the per-query `shortlist`
    * pays the id equi-join back to exact vectors for the rounded-cosine
    * rerank. Ties break on corpus_id at both stages, so the DuckDB
    * oracle replays thresholds, codes, Hamming and the rerank exactly.
    */
  def bqKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      thresholds: Array[Double],
      shortlist: Int,
      k: Int,
      roundTo: Int = 4
  ): DataFrame = {
    import graft.functions.VectorKernels
    val thrL = lit(thresholds)
    val codes = corpus.select(
      col(idCol).cast("long").as("corpus_id"),
      VectorKernels.signBits64(transform(col(vecCol), _.cast("double")), thrL).as("code"))
    val qv = transform(col(vecCol), _.cast("double"))
    val q = queries.select(
      col(idCol).cast("long").as("query_id"),
      qv.as("qv"),
      VectorKernels.signBits64(qv, thrL).as("qcode"),
      sqrt(VectorKernels.vecDot(qv, qv)).as("qn"))
    // Shortlist window shuffles ONLY (query_id, corpus_id, ham); qv/qn
    // re-join from the broadcast query frame after the filter.
    val pairs = codes
      .crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        bit_count(col("code").bitwiseXOR(col("qcode"))).as("ham"))
    val wHam = Window.partitionBy("query_id").orderBy(asc("ham"), asc("corpus_id"))
    val cand = pairs
      .withColumn("rn", row_number().over(wHam))
      .filter(col("rn") <= shortlist)
      .drop("rn")
    val exact = corpus.select(
      col(idCol).cast("long").as("corpus_id"),
      transform(col(vecCol), _.cast("double")).as("cv"))
      .withColumn("cn", sqrt(VectorKernels.vecDot(col("cv"), col("cv"))))
    val resc = broadcast(cand)
      .join(exact, "corpus_id")
      .join(broadcast(q.select(col("query_id"), col("qv"), col("qn"))), "query_id")
      .select(col("query_id"), col("corpus_id"), col("ham"),
        round(VectorKernels.vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")), roundTo)
          .as("sim"))
    val wSim = Window.partitionBy("query_id").orderBy(desc("sim"), asc("corpus_id"))
    resc
      .withColumn("rank", row_number().over(wSim))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "ham", "sim", "rank")
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

  /** Embedding QC: per-label centroids and the vectors farthest from
    * their own label's centroid — the standard screen for mislabeled
    * or corrupt embeddings before they reach training.
    *
    * Determinism: centroids use the DECIMAL(28,14) per-cell mean (the
    * Ivf pattern — exact decimal addition, so centroid bits are
    * independent of partitioning); distances fold dimensions in a
    * FIXED left-associative order and round to `roundTo`, the ss01
    * policy the oracle mirrors with the same fold.
    *
    * Shape: centroid table is |labels|×d cells (an aggregation, never
    * collected to the driver beyond the broadcast join Spark itself
    * plans for a labels-sized dim table); distance is one map-side
    * pass over the corpus; top-k via TakeOrdered. No corpus-sized
    * state anywhere.
    */
  def centroidOutliers(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      roundTo: Int = 4
  ): DataFrame = {
    val cells = emb
      .select(col(labelCol).as("lbl"), posexplode(col(vecCol).cast("array<double>")))
      .groupBy("lbl", "pos")
      .agg((sum(col("col").cast("decimal(28,14)")).cast("double") / count(lit(1))).as("m"))
    val centroids = cells
      .groupBy("lbl")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("c"))
    emb
      .select(col(idCol), col(labelCol).as("lbl"), col(vecCol).cast("array<double>").as("v"))
      .join(broadcast(centroids), Seq("lbl"))
      .select(col(idCol), col("lbl").as(labelCol),
        round(sqrt(aggregate(
          zip_with(col("v"), col("c"), (a, b) => (a - b) * (a - b)),
          lit(0.0d), (acc, x) => acc + x)), roundTo).as("dist"))
      .orderBy(desc("dist"), col(idCol))
      .limit(k)
  }
}
