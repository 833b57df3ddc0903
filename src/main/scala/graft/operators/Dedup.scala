package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around its 100 TB shuffle profile:
  *
  *  - exact: hash-groupBy on a 64-bit fingerprint (shuffle key is 8
  *    bytes, not the document), keeper = min id;
  *  - MinHash + LSH: per-row signature computation in one native
  *    kernel (zero shuffle; graft.functions.Sketches), then ONE
  *    shuffle on (band, band values) to find candidates, then exact
  *    verification restricted to candidates;
  *  - SimHash: per-row 64-bit sketch via the same kernel family,
  *    near-dup = equal sketch (or banded Hamming buckets);
  *  - exact n-gram Jaccard: explode distinct shingles → self-join on
  *    shingle → per-pair intersection counts; the O(pairs) step only
  *    materializes pairs that share ≥1 shingle.
  */
object Dedup {

  // Hash note: every sketch in this file hashes tokens/grams with the
  // polynomial rolling hash (functions.RollingHash64 family), chosen
  // over xxhash64 deliberately — its fold is reproducible in plain SQL
  // (HUGEINT mod-2^64 arithmetic), so MinHash/SimHash/winnowing get
  // EXACT DuckDB oracles instead of rows-only checks. Quality is
  // sufficient for sketching (measured: MinHash |est − exact| ≤ 0.16,
  // SimHash near/far hamming 4/29 on the spec fixtures).

  // ── shingling ─────────────────────────────────────────────────────
  /** Distinct word k-grams of `text` as an array column. Pure per-row
    * HOF compute (split → slice windows → concat), no shuffle.
    * The hot paths use the native kernels in functions.Sketches; this
    * declarative form remains the readable reference (specs compare
    * against it).
    */
  def wordShingles(text: Column, k: Int): Column =
    shinglesFromWords(split(trim(text), "\\s+"), k)

  private def slidingGrams(words: Column, k: Int): Column = {
    val n = size(words)
    val shifted = (1 until k).map(i => slice(words, lit(i + 1), n))
    val zipped =
      shifted.foldLeft(words)((acc, s) => zip_with(acc, s, (a, b) => concat_ws(" ", a, b)))
    when(n >= k, slice(zipped, lit(1), n - k + 1)).otherwise(array().cast("array<string>"))
  }

  /** Shingles via k-1 shifted copies zipped together — NOT via
    * `transform(sequence(...), i => slice(words, ...))`: referencing
    * the words array inside a lambda re-evaluates its whole subtree
    * (including the regex split) once per element, turning an O(n)
    * shingling into O(n²)-with-regex. The shifted-zip form evaluates
    * each slice once per row.
    */
  def shinglesFromWords(words: Column, k: Int): Column =
    // zip_with null-pads to the longer side; slidingGrams drops the
    // k-1 partial windows at the tail
    array_distinct(slidingGrams(words, k))

  // ── exact dedup ───────────────────────────────────────────────────
  /** Exact duplicate groups: rows agreeing on `key` columns. Returns
    * one row per distinct key with keeper id (min), duplicate count.
    * The groupBy shuffles xxhash64(key) + id only — constant-width
    * rows regardless of document size — then keeps one full row per
    * group via a second semi-join.
    */
  def exactDedupStats(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** The deduplicated frame itself: keep the min-id row per key. */
  def exactDedup(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Content fingerprint over the key columns for the incremental
    * exact-dedup index: md5 of the concatenated keys (the same
    * fingerprint family td02 oracle-checks).
    */
  private def keyFingerprint(keyCols: Seq[String]): Column =
    md5(concat_ws("", keyCols.map(col): _*))

  /** Persist the distinct content fingerprints of a corpus — the exact
    * complement of [[writeLshIndex]]: new batches drop their
    * already-seen rows with [[dropKnownExact]] without re-reading the
    * historical text (fingerprints are 32 chars per distinct content).
    * Append mode, so each ingested batch can add its own fingerprints.
    */
  def writeFingerprintIndex(
      df: DataFrame,
      keyCols: Seq[String],
      path: String,
      mode: String = "overwrite"
  ): Unit =
    df.select(keyFingerprint(keyCols).as("fp")).distinct()
      .write.mode(mode).parquet(path)

  /** Rows of `newDf` whose content was NOT seen by the stored
    * fingerprint index — one anti-join on the 32-char fingerprint, the
    * cheapest possible cross-batch exact dedup. Batch-internal
    * duplicates are [[exactDedup]]'s job.
    */
  def dropKnownExact(newDf: DataFrame, keyCols: Seq[String], path: String): DataFrame = {
    val spark = newDf.sparkSession
    val known = spark.read.parquet(path)
    newDf
      .withColumn("__fp", keyFingerprint(keyCols))
      .join(known, col("__fp") === col("fp"), "left_anti")
      .drop("__fp")
  }

  // ── MinHash + LSH ─────────────────────────────────────────────────
  /** Deterministic universal-hash parameters for n permutations.
    * Domain is the Mersenne prime 2^31-1 so `a*h + b` stays below
    * 2^62 — Spark 4 runs ANSI mode, where a 64-bit overflow is an
    * error, not a wrap.
    */
  val MersennePrime: Long = (1L << 31) - 1

  /** Deterministic (a, b) universal-hash parameters — public so the
    * DuckDB oracle SQL can embed the identical constants.
    */
  def hashParams(n: Int): Seq[(Long, Long)] =
    (0 until n).map { i =>
      // splitmix64-style mixing of the permutation index → (a, b)
      def mix(z0: Long): Long = {
        var z = z0 + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      val a = math.abs(mix(i.toLong * 2 + 1)) % (MersennePrime - 1) + 1
      val b = math.abs(mix(i.toLong * 2 + 2)) % MersennePrime
      (a, b)
    }

  /** MinHash signature (array<long> of length n) over the document's
    * shingle set: sig[i] = min over shingles of (a_i*h + b_i) mod p,
    * h = rolling_hash64(shingle). One native per-row kernel
    * (Sketches.MinHashSigExpr) — signatures for 100 TB cost one scan,
    * no shuffle.
    */
  def minHashSignature(text: Column, k: Int = 3, numHashes: Int = 64): Column =
    graft.functions.Sketches.minHashSigCol(text, k, numHashes)

  /** LSH banding: split the signature into `bands` bands of `r` rows;
    * a pair is a candidate iff some band matches exactly. Emits
    * (band_idx, band_key) rows where band_key is the band's r
    * signature values verbatim — joining on the exact values (8r
    * bytes) instead of a 64-bit re-hash keeps candidate semantics
    * bit-reproducible in the SQL oracle; swap in a hash of the slice
    * if the shuffle-key width ever dominates at scale.
    */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band_idx"), slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)).as("band_key"))
    )

  /** Candidate near-duplicate pairs via MinHash LSH, with the MinHash
    * Jaccard estimate. `threshold` filters on the estimate;
    * verification against exact Jaccard is [[jaccardPairs]]'s job.
    */
  def minHashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    // signatures computed ONCE and materialized: three consumers (the
    // banding explode and both estimate-side lookups)
    val sigs = df
      .select(col(idCol).as("id"), minHashSignature(col(textCol), k, numHashes).as("sig"))
      .where(size(col("sig")) > 0)
      .localCheckpoint()
    // candidate discovery joins NARROW rows (id, band_idx, r band
    // values) — the 64-long signatures do NOT travel through the
    // self-join shuffle. At corpus scale the candidate set is orders
    // of magnitude smaller than the banded set, so signatures are
    // re-fetched afterwards only for survivors.
    val banded = sigs
      .select(col("id"), explode(lshBands(col("sig"), bands, r)).as("band"))
      .select(col("id"), col("band.band_idx"), col("band.band_key"))
    val cand = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(
        col("id_a"), col("id_b"),
        // native position-agreement count — integer-exact, replaces an
        // interpreted aggregate(zip_with) fold per candidate pair
        (graft.functions.VectorKernels.longEqCount(col("sig_a"), col("sig_b"))
          .cast("double") / numHashes).as("est_jaccard")
      )
      .filter(col("est_jaccard") >= threshold)
  }

  /** Persist the MinHash LSH index — band postings (partitioned by
    * band_idx) plus the signatures — so INCREMENTAL dedup never
    * re-reads or re-sketches the historical corpus: a daily batch
    * joins its own postings against the stored ones. At 100 TB the
    * text is the expensive part; the index is ~`numHashes` longs per
    * document plus narrow posting rows.
    */
  def writeLshIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      k: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      mode: String = "overwrite"
  ): Unit = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    writeLshIndexSigs(
      df.select(col(idCol).as("id"), minHashSignature(col(textCol), k, numHashes).as("sig"))
        .where(size(col("sig")) > 0)
        .localCheckpoint(),
      path, bands, numHashes / bands, mode)
  }

  /** Index write from PRE-COMPUTED signatures (id, sig) — the shared
    * tail of [[writeLshIndex]], exposed so [[ingestBatch]] can sketch
    * each batch once and feed both the index probe and the append.
    */
  private def writeLshIndexSigs(
      sigs: DataFrame, path: String, bands: Int, rowsPerBand: Int, mode: String): Unit = {
    // The two index parts are independent (different dirs, both read
    // from the materialized `sigs` blocks) and BOTH complete before
    // this returns, so the ingest's crash-ordering contract — sink ≺
    // lsh index ≺ fingerprint index — is unchanged; overlapping them
    // just back-fills the tail of one small write job with the other
    // (guide §2.6). Failures from either write surface after both have
    // settled, so no write is left running behind a thrown exception.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val bandsF = Future {
      sigs
        .select(col("id"), explode(lshBands(col("sig"), bands, rowsPerBand)).as("band"))
        .select(col("id"), col("band.band_idx"), col("band.band_key"))
        .repartition(col("band_idx"))
        .write.mode(mode).partitionBy("band_idx").parquet(s"$path/bands")
    }
    val sigsF = Future {
      sigs.write.mode(mode).parquet(s"$path/sigs")
    }
    val settled = Seq(bandsF, sigsF).map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    settled.foreach(_.get)
  }

  /** Index maintenance for the incremental dedup indexes — the VACUUM
    * debt daily appends accumulate (the reference pays it in
    * maintenance_procedures.sql:56-116). Rewrites `bands/` (preserving
    * its band_idx partition layout) and `sigs/` into right-sized files;
    * candidates from [[dedupAgainstIndex]] are unchanged bit-for-bit.
    * Exact duplicate rows — the artifact a crashed-and-retried append
    * leaves (see [[ingestBatch]]'s crash-ordering contract) — are
    * collapsed; a single ingest never writes the same (id, band) or
    * (id, sig) row twice, so distinct rows are untouched.
    */
  def compactLshIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024
  ): Seq[graft.ops.Maintenance.CompactionReport] = {
    // disjoint dirs → concurrent rewrites, both settled before return
    // (same §2.6 overlap as writeLshIndexSigs)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val parts = Seq(
      Future(graft.ops.Maintenance.compact(spark, s"$path/bands", targetFileBytes,
        partitionCols = Seq("band_idx"), dropDuplicates = true)),
      Future(graft.ops.Maintenance.compact(spark, s"$path/sigs", targetFileBytes,
        dropDuplicates = true)))
    val settled = parts.map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    settled.map(_.get)
  }

  /** Compact the exact-dedup fingerprint index: merges append-mode
    * small files AND re-distincts fingerprints that multiple batches
    * wrote independently (each batch distincts only itself).
    */
  def compactFingerprintIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024
  ): graft.ops.Maintenance.CompactionReport =
    graft.ops.Maintenance.compact(spark, path, targetFileBytes, dropDuplicates = true)

  /** Append-cadence trigger: compact either index once its parquet file
    * count exceeds `maxFiles` (≈ batches × partitions since the last
    * compaction). Returns true when a compaction ran — callers wire
    * this after each batch append, mirroring the reference's scheduled
    * VACUUM loop.
    */
  def maybeCompactIndexes(
      spark: org.apache.spark.sql.SparkSession,
      lshPath: Option[String] = None,
      fingerprintPath: Option[String] = None,
      maxFiles: Long = 256L
  ): Boolean = {
    // The three compactions (bands, sigs, fingerprints) rewrite
    // DISJOINT directories from already-committed inputs, so when both
    // indexes are due they run concurrently (guide §2.6) — all settle
    // before return, and a failure surfaces only after every rewrite
    // has finished or failed, exactly as the sequential form did.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val lshDue = lshPath.filter(p =>
      graft.ops.Maintenance.parquetFileCount(spark, p) > maxFiles)
    val fpDue = fingerprintPath.filter(p =>
      graft.ops.Maintenance.parquetFileCount(spark, p) > maxFiles)
    val work: Seq[Future[Unit]] =
      lshDue.map(p => Future { compactLshIndex(spark, p); () }).toSeq ++
        fpDue.map(p => Future { compactFingerprintIndex(spark, p); () }).toSeq
    val settled = work.map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    settled.foreach(_.get)
    lshDue.nonEmpty || fpDue.nonEmpty
  }

  /** Result of one [[ingestBatch]]: the batch rows that survived exact
    * dedup, their near-dup candidates against the historical corpus,
    * and whether the post-append compaction trigger fired.
    */
  final case class BatchIngest(
      fresh: DataFrame,
      nearDups: DataFrame,
      compacted: Boolean)

  /** The incremental-dedup ingest step a scheduled pipeline runs per
    * batch (the operational composition of the pieces above, with the
    * maintenance trigger wired in — the reference runs the equivalent
    * VACUUM on a schedule, maintenance_procedures.sql:56-116):
    *
    *  1. drop rows whose exact content the corpus has seen
    *     ([[dropKnownExact]] anti-join — historical text never re-read);
    *  2. near-dup candidates of the survivors vs the stored LSH index
    *     ([[dedupAgainstIndex]]);
    *  3. append the survivors' fingerprints + sketches to both indexes;
    *  4. [[maybeCompactIndexes]] — compact once the append debt passes
    *     `maxFiles`, so a daily feed cannot degrade probe joins into
    *     thousand-file scans.
    *
    * The first batch (no index on disk yet) bootstraps both indexes in
    * overwrite mode and reports no duplicates. `fresh` is checkpointed
    * before the index append so steps 2–4 and the caller's sink all
    * reuse one computation of the batch sketches.
    *
    * Crash-ordering contract: `freshSink` (the caller's durable store
    * append) runs BEFORE either index append. Plain parquet appends
    * have no transaction, so a crash can land between any two writes;
    * the one UNRECOVERABLE interleaving is a fingerprint index that
    * has learned rows the durable store never received — the
    * re-delivery then dies in the anti-join and the content is lost.
    * Sink-first makes every crash point converge under re-delivery:
    * either nothing learned the batch, or the store holds it
    * at-least-once (exact duplicate rows, collapsed by the caller's
    * idempotent read — e.g. `CurationPipeline.packAndAudit`) while the
    * indexes catch up on the retry. Index-side duplicate rows from the
    * same retry are collapsed at probe time (the candidate `distinct`)
    * and physically removed by the next compaction.
    */
  def ingestBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      lshPath: String,
      fingerprintPath: String,
      threshold: Double = 0.5,
      maxFiles: Long = 256L,
      k: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      freshSink: DataFrame => Unit = _ => (),
      precomputedSigs: Option[DataFrame] = None
  ): BatchIngest = {
    val spark = batch.sparkSession
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val bootstrap = !new java.io.File(fingerprintPath).exists()
    val deduped = exactDedup(batch, idCol, Seq(textCol))
    // the batch is sketched ONCE; the same materialized signatures feed
    // the index probe and the index append. A caller that already
    // sketched the batch upstream (the curation pipeline's decontam
    // probe sketches every quality survivor BEFORE this ingest) passes
    // `precomputedSigs` — columns (idCol, sig), computed with the SAME
    // (k, numHashes) — and the per-delivery text pass here collapses to
    // an id semi-join of the materialized signatures.
    def sigsOf(df: DataFrame) = precomputedSigs match {
      case Some(pre) =>
        pre.select(col(idCol).as("id"), col("sig"))
          .join(df.select(col(idCol).as("id")), Seq("id"), "left_semi")
          .localCheckpoint()
      case None => df
        .select(col(idCol).as("id"), minHashSignature(col(textCol), k, numHashes).as("sig"))
        .where(size(col("sig")) > 0)
        .localCheckpoint()
    }
    if (bootstrap) {
      val fresh = deduped.localCheckpoint()
      freshSink(fresh)
      writeLshIndexSigs(sigsOf(fresh), lshPath, bands, numHashes / bands, mode = "overwrite")
      writeFingerprintIndex(fresh, Seq(textCol), fingerprintPath)
      BatchIngest(fresh, spark.emptyDataFrame
        .selectExpr("cast(null as long) id_new", "cast(null as long) id_old",
          "cast(null as double) est_jaccard").limit(0), compacted = false)
    } else {
      val fresh = dropKnownExact(deduped, Seq(textCol), fingerprintPath).localCheckpoint()
      val sigs = sigsOf(fresh)
      // materialized BEFORE the index append: the candidate plan reads
      // the CURRENT index files, and step 4's compaction may delete
      // them — a caller forcing a lazy nearDups after compaction would
      // die on vanished parquet parts
      val cands = dedupAgainstIndexSigs(sigs, lshPath, numHashes, bands, threshold)
        .localCheckpoint()
      freshSink(fresh)
      writeLshIndexSigs(sigs, lshPath, bands, numHashes / bands, mode = "append")
      writeFingerprintIndex(fresh, Seq(textCol), fingerprintPath, mode = "append")
      val compacted = maybeCompactIndexes(
        spark, Some(lshPath), Some(fingerprintPath), maxFiles)
      BatchIngest(fresh, cands, compacted)
    }
  }

  /** Near-duplicate candidates of a NEW batch against a
    * [[writeLshIndex]]-stored corpus: the batch is sketched and banded
    * (map-only), then equi-joined against the stored postings on
    * (band_idx, band_key) — the historical TEXT is never touched, and
    * the estimate joins the stored signatures only for surviving
    * candidates. Returns (id_new, id_old, est_jaccard); batch-internal
    * duplicates are [[minHashCandidates]] over the batch itself.
    * Same parameters ⇒ the pair estimates are bit-identical to a
    * full-corpus [[minHashCandidates]] run restricted to cross pairs.
    */
  def dedupAgainstIndex(
      newDf: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      k: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val newSigs = newDf
      .select(col(idCol).as("id"), minHashSignature(col(textCol), k, numHashes).as("sig"))
      .where(size(col("sig")) > 0)
      .localCheckpoint()
    dedupAgainstIndexSigs(newSigs, path, numHashes, bands, threshold)
  }

  /** Index probe from PRE-COMPUTED batch signatures — the shared tail
    * of [[dedupAgainstIndex]] (see [[writeLshIndexSigs]]).
    */
  private def dedupAgainstIndexSigs(
      newSigs: DataFrame,
      path: String,
      numHashes: Int,
      bands: Int,
      threshold: Double
  ): DataFrame = {
    val r = numHashes / bands
    val spark = newSigs.sparkSession
    val newBanded = newSigs
      .select(col("id"), explode(lshBands(col("sig"), bands, r)).as("band"))
      .select(col("id").as("id_new"), col("band.band_idx"), col("band.band_key"))
    val stored = spark.read.parquet(s"$path/bands")
      .select(col("id").as("id_old"), col("band_idx"), col("band_key"))
    val cand = newBanded
      .join(stored, Seq("band_idx", "band_key"))
      .filter(col("id_new") =!= col("id_old"))
      .select("id_new", "id_old")
      .distinct()
    val storedSigs = spark.read.parquet(s"$path/sigs")
      .select(col("id").as("id_old"), col("sig").as("sig_old"))
    cand
      .join(newSigs.select(col("id").as("id_new"), col("sig").as("sig_new")), "id_new")
      .join(storedSigs, "id_old")
      .select(
        col("id_new"), col("id_old"),
        (graft.functions.VectorKernels.longEqCount(col("sig_new"), col("sig_old"))
          .cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      // a crashed-and-retried append can leave a stored id's identical
      // (id, sig) row twice until compaction; collapsing the resulting
      // identical output rows here costs one exchange over the already
      // candidate-sized (not corpus-sized) result
      .distinct()
  }

  // ── exact n-gram Jaccard ──────────────────────────────────────────
  /** Exact word-k-gram Jaccard for all pairs sharing at least one
    * shingle. shuffle profile: explode shingles (map-side), self-join
    * grouped on the shingle hash, then per-pair count aggregation.
    * At corpus scale, run AFTER LSH restricts the pair set; standalone
    * it is the oracle-verifiable ground truth.
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      threshold: Double = 0.0
  ): DataFrame = {
    // join on the 8-byte shingle hash, not the shingle string — the
    // shuffle moves fixed-width keys; xxhash64 collisions are
    // negligible for intersection COUNTING at these cardinalities.
    // localCheckpoint: this frame feeds three consumers (sizes + both
    // self-join sides); materializing once replaces three evaluations
    // of the regex-split/shingle/hash pipeline with one.
    val sh = df
      .select(col(idCol).as("id"),
        explode(graft.functions.Sketches.gramXxHashesCol(col(textCol), k)).as("h"))
      .localCheckpoint()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n")) // shingles are distinct already
    val pairs = sh.alias("x")
      .join(sh.alias("y"), col("x.h") === col("y.h") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
      .withColumn("jaccard", col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_common", "jaccard")
  }

  /** Asymmetric near-dup: n-gram CONTAINMENT (Broder's measure).
    * Jaccard misses a short document wholly embedded in a much longer
    * one (the union term drowns the overlap); containment
    * |A∩B| / |A| is direction-aware and catches exactly that quote /
    * excerpt / page-within-crawl shape. Emits both directions and
    * filters on the larger; same fixed-width hash-join scale shape as
    * [[jaccardPairs]] — the shuffle key is the 8-byte shingle hash.
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      threshold: Double = 0.5
  ): DataFrame = {
    val sh = df
      .select(col(idCol).as("id"),
        explode(graft.functions.Sketches.gramXxHashesCol(col(textCol), k)).as("h"))
      .localCheckpoint()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val pairs = sh.alias("x")
      .join(sh.alias("y"), col("x.h") === col("y.h") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
      .withColumn("cont_a", col("n_common").cast("double") / col("n_a"))
      .withColumn("cont_b", col("n_common").cast("double") / col("n_b"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= threshold)
      .select("id_a", "id_b", "n_common", "cont_a", "cont_b")
  }

  // ── size gates for the exact-pair family ──────────────────────────
  /** Exact fan-out of the all-shingle self-join [[jaccardPairs]] /
    * [[containmentPairs]] would execute: Σ_h n_h² over the shingle-
    * hash postings (ordered-pair count, which upper-bounds the
    * unordered `id_a < id_b` join). ONE narrow pass — explode to
    * 8-byte hashes, partial-aggregated count per hash, one scalar sum
    * — so the gate costs a corpus scan, never the join it is guarding
    * against. This is the "pre-filter before joining facts" discipline
    * (reference `create_f_get_event_changes.sql:26-60`) applied to the
    * one operator family whose cost is quadratic in duplicate
    * multiplicity.
    */
  def exactPairFanout(df: DataFrame, idCol: String, textCol: String, k: Int = 3): Long =
    // n² and its sum run in DECIMAL: a single hyper-frequent shingle at
    // corpus scale squares past 2^63, and an ANSI overflow inside the
    // GATE would kill exactly the oversized run it is supposed to
    // reroute. Saturate to Long.MaxValue — "too big" is all callers ask.
    df.select(explode(graft.functions.Sketches.gramXxHashesCol(col(textCol), k)).as("h"))
      .groupBy("h").agg(count(lit(1)).cast("decimal(19,0)").as("n"))
      .agg(sum(col("n") * col("n")).as("f"))
      .collect().headOption.flatMap(r => Option(r.get(0))).map {
        case d: java.math.BigDecimal =>
          if (d.compareTo(java.math.BigDecimal.valueOf(Long.MaxValue)) > 0) Long.MaxValue
          else d.longValueExact()
        case other => other.toString.toLong
      }.getOrElse(0L)

  /** Exact containment pairs with PREFIX FILTERING — the asymmetric
    * counterpart of [[jaccardPairsPrefix]], same results as
    * [[containmentPairs]] at the same threshold (spec-proven).
    *
    * Bound: a pair qualifies iff n_common ≥ t·min(n_a, n_b). Sort each
    * doc's grams rarest-first (global df asc, hash asc); the SMALLER
    * doc s then has ⌈t·n_s⌉ ≤ n_common common grams, of which at most
    * ⌈t·n_s⌉ − 1 fit in its suffix of that size — so at least one
    * common gram lies inside s's own prefix of length
    * n_s − ⌈t·n_s⌉ + 1. Joining every doc's prefix against the FULL
    * postings therefore catches every qualifying pair (with the
    * prefix side playing the smaller role); frequent grams still
    * join, but only through the few docs rare-poor enough to carry
    * them in a prefix — the posting-squared term collapses to
    * Σ_h pfx_h·n_h. Verification is exact and confined to the
    * candidate neighborhood, as in [[jaccardPairsPrefix]].
    */
  def containmentPairsPrefix(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      threshold: Double = 0.5
  ): DataFrame = {
    require(threshold > 0, "prefix filtering needs a positive threshold")
    val sh = df
      .select(col(idCol).as("id"),
        explode(graft.functions.Sketches.gramXxHashesCol(col(textCol), k)).as("h"))
      .localCheckpoint()
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val ordered = sh
      .join(dfreq, "h")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("g"),
        count(lit(1)).as("n"))
    val plen = (col("n") - ceil(col("n") * threshold) + 1).cast("int")
    val prefix = ordered
      .select(col("id"), explode(slice(col("g"), lit(1), plen)).as("p"))
      .select(col("id"), col("p.h").as("h"))
    // prefix side ⋈ FULL postings (not prefix ⋈ prefix): only the
    // smaller doc of a qualifying pair is guaranteed a prefix hit
    val cand = prefix.alias("a")
      .join(sh.alias("b"), col("a.h") === col("b.h") && col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    val ids = cand.select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val shC = sh.join(ids, Seq("id"), "left_semi").localCheckpoint()
    val sizes = shC.groupBy("id").agg(count(lit(1)).as("n"))
    shC.alias("x")
      .join(shC.alias("y"), col("x.h") === col("y.h") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(cand, Seq("id_a", "id_b"), "left_semi")
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
      .withColumn("cont_a", col("n_common").cast("double") / col("n_a"))
      .withColumn("cont_b", col("n_common").cast("double") / col("n_b"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= threshold)
      .select("id_a", "id_b", "n_common", "cont_a", "cont_b")
  }

  /** Size-gated exact Jaccard pairs (VERDICT r12 item 1): measure the
    * self-join fan-out FIRST ([[exactPairFanout]], one narrow pass);
    * under `maxFanout` run the plain all-shingle join, over it route
    * through the prefix-filtered form — same exact output either way
    * (both are [[jaccardPairs]]-equal at the same threshold), so the
    * gate trades plan shape, never answers. A zero/negative threshold
    * over the cap is REFUSED loudly: with no threshold there is no
    * prefix bound, and silently running a posting-squared join over an
    * oversized corpus is exactly the 100 TB failure this gate exists
    * to prevent — LSH-restrict the pair set (dd01 → verify) instead.
    */
  def jaccardPairsGated(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      threshold: Double = 0.5,
      maxFanout: Long = 2000000000L
  ): DataFrame = {
    // maxFanout <= 0 decides the route with NO probe: fan ≥ 0 always,
    // and fan = 0 (an empty/shingle-free corpus) yields an empty result
    // from either path — so the probe scan would be paid only to learn
    // nothing (guide §1.2: don't compute things you throw away).
    val fan = if (maxFanout <= 0) Long.MaxValue else exactPairFanout(df, idCol, textCol, k)
    if (fan <= maxFanout) jaccardPairs(df, idCol, textCol, k, threshold)
    else {
      require(threshold > 0,
        s"exact-pair fan-out $fan exceeds maxFanout=$maxFanout and threshold=0 " +
          "admits no prefix bound: restrict candidates first (minHashCandidates " +
          "→ exact verify) or raise the threshold")
      jaccardPairsPrefix(df, idCol, textCol, k, threshold)
    }
  }

  /** Size-gated exact containment pairs — [[jaccardPairsGated]]'s
    * asymmetric sibling, routing oversized corpora through
    * [[containmentPairsPrefix]] (exact, prefix-pruned on the smaller
    * side of each pair).
    */
  def containmentPairsGated(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      threshold: Double = 0.5,
      maxFanout: Long = 2000000000L
  ): DataFrame = {
    // see jaccardPairsGated: maxFanout <= 0 needs no probe scan
    val fan = if (maxFanout <= 0) Long.MaxValue else exactPairFanout(df, idCol, textCol, k)
    if (fan <= maxFanout) containmentPairs(df, idCol, textCol, k, threshold)
    else {
      require(threshold > 0,
        s"exact-pair fan-out $fan exceeds maxFanout=$maxFanout and threshold=0 " +
          "admits no prefix bound: restrict candidates first (minHashCandidates " +
          "→ exact verify) or raise the threshold")
      containmentPairsPrefix(df, idCol, textCol, k, threshold)
    }
  }

  /** Exact Jaccard self-join with PREFIX FILTERING (the PPJoin family,
    * Xiao et al.): a pair can reach jaccard ≥ t only if the two
    * documents share a token inside their first |x| − ⌈t·|x|⌉ + 1
    * grams under one GLOBAL token order — so candidate generation
    * joins only those prefixes instead of every gram occurrence.
    * Rarest-first order (global df asc, hash asc) keeps prefix
    * postings short where it matters: frequent grams fall outside
    * most prefixes and never join. Same results as [[jaccardPairs]]
    * at the same threshold (spec-proven); at high thresholds the
    * self-join shuffles a small fraction of the postings.
    */
  def jaccardPairsPrefix(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      threshold: Double = 0.5
  ): DataFrame = {
    require(threshold > 0, "prefix filtering needs a positive threshold")
    val sh = df
      .select(col(idCol).as("id"),
        explode(graft.functions.Sketches.gramXxHashesCol(col(textCol), k)).as("h"))
      .localCheckpoint()
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val ordered = sh
      .join(dfreq, "h")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("g"),
        count(lit(1)).as("n"))
    val plen = (col("n") - ceil(col("n") * threshold) + 1).cast("int")
    val prefix = ordered
      .select(col("id"), explode(slice(col("g"), lit(1), plen)).as("p"))
      .select(col("id"), col("p.h").as("h"))
    val cand = prefix.alias("a")
      .join(prefix.alias("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // exact verification confined to the candidate neighborhood
    val ids = cand.select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val shC = sh.join(ids, Seq("id"), "left_semi").localCheckpoint()
    val sizes = shC.groupBy("id").agg(count(lit(1)).as("n"))
    shC.alias("x")
      .join(shC.alias("y"), col("x.h") === col("y.h") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(cand, Seq("id_a", "id_b"), "left_semi")
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_common", "jaccard")
  }

  /** Exact n-gram decontamination (the GPT-3 appendix-C / PaLM
    * protocol): flag TRAINING documents that share any word k-gram
    * with an EVALUATION set, reporting per-doc overlap counts
    * (distinct shared grams, distinct eval docs hit, contamination
    * fraction) so callers can drop or audit the leaks. The exact-join
    * complement of the Bloom probe (td16): that one is constant-
    * memory but approximate; this one names the leaking eval docs.
    *
    * Scale shape: eval suites are fixed-size (benchmarks don't grow
    * with the corpus), so the eval gram set is BROADCAST and the
    * probe is a map-side hash join — no corpus-wide shuffle. Per-doc
    * gram totals come from `size()` of the distinct-gram array before
    * the explode, so only HIT rows (contaminated grams) ever reach
    * the aggregation shuffle.
    */
  def ngramDecontam(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8
  ): DataFrame = {
    val evalGrams = eval.select(
      col(idCol).as("eval_id"),
      explode(graft.functions.Sketches.gramXxHashesCol(col(textCol), k)).as("h"))
    train
      .select(col(idCol).as("doc_id"),
        graft.functions.Sketches.gramXxHashesCol(col(textCol), k).as("gs"))
      .select(col("doc_id"), size(col("gs")).as("n_grams"), explode(col("gs")).as("h"))
      .join(broadcast(evalGrams), "h")
      .groupBy("doc_id", "n_grams")
      .agg(countDistinct(col("h")).as("n_shared_grams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .withColumn("contaminated_frac",
        col("n_shared_grams").cast("double") / col("n_grams").cast("double"))
      .select("doc_id", "n_grams", "n_shared_grams", "n_eval_docs", "contaminated_frac")
  }

  /** Fuzzy decontamination (the GPT-3/Pile eval-set near-dup filter):
    * flag TRAIN documents whose MinHash-estimated Jaccard against some
    * EVAL document reaches `threshold` — the LSH form of
    * [[ngramDecontam]] for when exact n-gram overlap is too strict
    * (paraphrased or lightly-edited benchmark leakage). Same sketch
    * constants and band join as [[minHashCandidates]], but CROSS-corpus:
    * the eval side is the broadcast side by contract (benchmarks are
    * tiny next to a 100 TB corpus), so the corpus is never shuffled —
    * band keys stream past the broadcast postings, and only candidate
    * survivors re-fetch signatures for the agreement estimate. Returns
    * one row per contaminated train doc: (doc_id, n_eval_docs,
    * max_est).
    */
  def lshDecontam(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.35
  ): DataFrame =
    lshDecontamPrepared(train,
      prepareEvalIndex(eval, idCol, textCol, k, numHashes, bands),
      idCol, textCol, threshold)

  /** Materialized eval-side decontamination index: MinHash signatures
    * of the eval suite, computed ONCE and reused across every probe
    * (VERDICT r12 item 4 — re-shingling a static eval corpus per
    * delivery was the measured ≈ +12 s/4-delivery stage cost in the
    * DecontamAb isolation). The sigs frame is `localCheckpoint`ed, so
    * each delivery's broadcast build reads tiny materialized blocks
    * instead of re-running the shingle→minhash kernels; call
    * [[EvalIndex.release]] when the pipeline instance retires.
    */
  final case class EvalIndex(sigs: DataFrame, k: Int, numHashes: Int, bands: Int) {
    def release(): Unit = Checkpoints.dropBlocks(sigs)
  }

  /** Build the eval side of [[lshDecontam]] once. Same sketch
    * constants as [[minHashCandidates]] by default; the probe side
    * must use a matching `k`/`numHashes` (it reads them off the
    * index).
    */
  def prepareEvalIndex(
      eval: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16
  ): EvalIndex = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    graft.functions.Sketches.register(eval.sparkSession)
    graft.functions.VectorKernels.register(eval.sparkSession)
    val sigs = eval
      .select(col(idCol).as("eval_id"), minHashSignature(col(textCol), k, numHashes).as("sig"))
      .where(size(col("sig")) > 0)
      .localCheckpoint()
    EvalIndex(sigs, k, numHashes, bands)
  }

  /** Probe a prepared [[EvalIndex]] with a train batch — the
    * per-delivery half of [[lshDecontam]]. The train side may live in
    * a DIFFERENT session (a foreachBatch micro-batch analyzes in a
    * cloned session while the index came from the main one): the
    * index's checkpointed sigs are session-portable (LogicalRDD over
    * shared-context blocks), and the kernels are registered on the
    * train session here. `onTrainSigs` hands the caller the train-side
    * checkpoint so it can release those blocks once the (small) result
    * has been materialized.
    */
  def lshDecontamPrepared(
      train: DataFrame,
      idx: EvalIndex,
      idCol: String,
      textCol: String,
      threshold: Double = 0.35,
      onTrainSigs: DataFrame => Unit = _ => ()
  ): DataFrame = {
    val r = idx.numHashes / idx.bands
    graft.functions.Sketches.register(train.sparkSession)
    graft.functions.VectorKernels.register(train.sparkSession)
    def bandsOf(sigs: DataFrame, idName: String) = sigs
      .select(col(idName), explode(lshBands(col("sig"), idx.bands, r)).as("band"))
      .select(col(idName), col("band.band_idx"), col("band.band_key"))
    val trainSigs = train
      .select(col(idCol).as("doc_id"),
        minHashSignature(col(textCol), idx.k, idx.numHashes).as("sig"))
      .where(size(col("sig")) > 0)
      .localCheckpoint()
    onTrainSigs(trainSigs)
    val evalSigs = idx.sigs
    val cand = bandsOf(trainSigs, "doc_id")
      .join(broadcast(bandsOf(evalSigs, "eval_id")), Seq("band_idx", "band_key"))
      .select("doc_id", "eval_id")
      .distinct()
    cand
      .join(trainSigs.select(col("doc_id"), col("sig").as("sig_a")), "doc_id")
      .join(broadcast(evalSigs.select(col("eval_id"), col("sig").as("sig_b"))), "eval_id")
      .select(col("doc_id"), col("eval_id"),
        (graft.functions.VectorKernels.longEqCount(col("sig_a"), col("sig_b"))
          .cast("double") / idx.numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .groupBy("doc_id")
      .agg(countDistinct(col("eval_id")).as("n_eval_docs"),
        max(col("est_jaccard")).as("max_est"))
  }

  /** Sorted-neighborhood near-dup candidates (Hernández & Stolfo 1995
    * — the record-linkage classic, complementary to LSH banding): sort
    * the corpus by a BLOCKING KEY (first `keyLen` chars of the
    * dedup-normalized text), compare each row only against the next
    * `window` rows in that order, estimate similarity from MinHash
    * signature agreement. Catches prefix-similar near-dups at O(N·w)
    * pairs where banding needs a band collision.
    *
    * Scale shape: the global sort ranks come from range partitioning +
    * per-partition counts folded into offsets (the td36 pattern — one
    * control-plane collect of partition sizes, NO single-task window);
    * candidates are a narrow rank equi-join (each row probes its next
    * `window` rank slots), and the estimate is the native
    * signature-agreement kernel per surviving pair. Deterministic:
    * (key, id) is a total order, so ranks — and therefore pairs — are
    * partition-invariant and replay exactly in DuckDB.
    */
  def sortedNeighborhood(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 3,
      k: Int = 3,
      numHashes: Int = 64,
      keyLen: Int = 24,
      threshold: Double = 0.35
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(col(idCol).cast("long").as("id"),
        substring(graft.operators.TextAnalysis.normalizeForDedup(col(textCol)), 1, keyLen)
          .as("key"),
        minHashSignature(col(textCol), k, numHashes).as("sig"))
      .where(size(col("sig")) > 0)
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    // frozen once: both passes must observe the same partitioning
    val sorted = keyed
      .repartitionByRange(parts, col("key").asc, col("id").asc)
      .sortWithinPartitions(col("key").asc, col("id").asc)
      .localCheckpoint()
    val counts = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) => Iterator.single((pid, it.size.toLong)) }
      .collect()
      .sortBy(_._1)
    val offsets = new Array[Long](counts.length)
    var acc = 0L
    counts.foreach { case (pid, n) => offsets(pid) = acc; acc += n }
    val bcOff = spark.sparkContext.broadcast(offsets)
    val ranked = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var r = bcOff.value(pid)
        it.map { row => r += 1; (r, row.getLong(0), row.getSeq[Long](2)) }
      }
      .toDF("rank", "id", "sig")
    val probes = ranked.select(
      col("id").as("id_a"), col("sig").as("sig_a"),
      explode(sequence(col("rank") + 1, col("rank") + window)).as("rank_b"))
    probes
      .join(ranked.select(col("rank").as("rank_b"), col("id").as("id_b"),
        col("sig").as("sig_b")), "rank_b")
      .select(col("id_a"), col("id_b"),
        (graft.functions.VectorKernels.longEqCount(col("sig_a"), col("sig_b"))
          .cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Exact-Jaccard verification RESTRICTED to a candidate pair set —
    * the post-LSH step of the dedup pipeline. The shingle explode is
    * semi-joined down to documents that appear in some candidate pair
    * before the pair-counting join, so the quadratic step only ever
    * touches the (tiny) candidate neighborhood, never the corpus.
    */
  def verifyCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      candidates: DataFrame, // (id_a, id_b)
      k: Int = 3,
      threshold: Double = 0.5
  ): DataFrame = {
    val ids = candidates
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct()
    val sh = df
      .select(col(idCol).as("id"),
        explode(graft.functions.Sketches.gramXxHashesCol(col(textCol), k)).as("h"))
      .join(ids, Seq("id"), "left_semi")
      .localCheckpoint()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val counts = sh.alias("x")
      .join(sh.alias("y"), col("x.h") === col("y.h") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(candidates, Seq("id_a", "id_b"), "left_semi")
    counts
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** The COMPLETE near-dup pipeline a training-data team runs, as one
    * composable operator: MinHash signatures → LSH candidate pairs →
    * exact-Jaccard verification on candidates only → connected
    * components → per-document keeper assignment (keeper = min id in
    * the component; isolated documents keep themselves).
    *
    * Shuffle profile at 100 TB: one scan for signatures, one narrow
    * band-key shuffle for candidates, pair verification confined to
    * the candidate neighborhood, and a component resolution whose
    * input is the (tiny) verified edge list.
    *
    * @return (doc_id, keeper_id, is_kept)
    */
  def dedupPipeline(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      candidateThreshold: Double = 0.35,
      jaccardThreshold: Double = 0.5
  ): DataFrame = {
    val cand = minHashCandidates(df, idCol, textCol, k, numHashes, bands, candidateThreshold)
      .select("id_a", "id_b")
    val edges = verifyCandidates(df, idCol, textCol, cand, k, jaccardThreshold)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val comps = Graph.connectedComponents(edges)
    df.select(col(idCol).as("doc_id"))
      .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("keeper_id"))
      .withColumn("is_kept", col("doc_id") === col("keeper_id"))
  }

  // ── winnowing ─────────────────────────────────────────────────────
  /** Winnowing fingerprints (the MOSS document-fingerprint scheme):
    * the minimum k-gram hash in every window of `w` consecutive
    * k-grams, deduplicated. Guarantees any shared substring of length
    * ≥ w+k-1 words produces at least one shared fingerprint, at ~1/w
    * the storage of full shingling — the partial-overlap detector
    * exact Jaccard and MinHash (whole-document measures) don't give.
    *
    * Window minima come from w shifted copies zipped with `least` —
    * the same linear-work pattern as [[shinglesFromWords]], NOT
    * slice-inside-lambda.
    */
  def winnowFingerprints(text: Column, k: Int = 3, w: Int = 4): Column =
    graft.functions.Sketches.winnowCol(text, k, w)

  // ── SimHash ───────────────────────────────────────────────────────
  /** 64-bit SimHash over whitespace tokens: per-bit vote sum of token
    * hashes, sign → bit. One HOF fold per row, zero shuffle. Near-dups
    * have small Hamming distance; equal sketches catch the tightest
    * band, `bit_count(s1 ^ s2) <= d` generalizes.
    */
  def simHash64(text: Column): Column =
    graft.functions.Sketches.simHash64Col(text)

  /** SimHash near-duplicate pairs via banded blocking (Manku,
    * Jain & Das Sarma, "Detecting Near-Duplicates for Web Crawling",
    * WWW 2007): split the 64-bit sketch into 4 16-bit bands —
    * any pair within Hamming distance ≤ 3 must agree on at least one
    * band (pigeonhole), so candidate discovery is a plain EQUI-join on
    * (band_idx, band_key), then the cheap exact popcount verifies
    * `maxHamming`. Same shuffle shape as MinHash LSH but the "sketch"
    * is ONE long per document — the lightest near-dup join there is.
    * The guarantee is exhaustive only for maxHamming ≤ 3 with 4
    * bands; larger thresholds keep high recall but are not exhaustive
    * (standard tradeoff).
    */
  /** Duplicate-SPAN detection — the "exact substring dedup" shape of
    * Lee et al., *Deduplicating Training Data Makes Language Models
    * Better* (2021), at word-window granularity: any `w`-word window
    * occurring more than once ANYWHERE in the corpus marks its span
    * duplicated, and per document the overlapping duplicated windows
    * merge into maximal spans (the text a cleaner would cut). Unlike
    * the document-level dedups above, this finds the boilerplate
    * paragraph pasted into otherwise-unique documents.
    *
    * Scale shape: windows shuffle as `(xxhash64, doc, pos)` — an
    * 8-byte key, never the window text; duplicated keys come from one
    * count>1 aggregation; the interval merge is a gaps-and-islands
    * window PARTITIONED BY document (nothing corpus-global, no
    * driver state). Like td13's contamination probe, equality is
    * decided on the 64-bit hash — at 2^-64 collision odds the span
    * arithmetic is exact in practice and the DuckDB oracle (which
    * groups the window strings themselves) verifies exactly that.
    *
    * @return one row per document that contains at least one
    *   duplicated window: (doc_id, n_words, n_dup_spans, dup_words,
    *   dup_ratio) where dup_words counts words inside merged spans.
    */
  def duplicateSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      w: Int
  ): DataFrame =
    mergedDupSpans(docs, idCol, textCol, w)
      .groupBy("doc_id", "n_words")
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("e0") - col("s0") + 1).as("dup_words"))
      .select(col("doc_id"), col("n_words"), col("n_dup_spans"), col("dup_words"),
        (col("dup_words").cast("double") / col("n_words")).as("dup_ratio"))

  /** The merged duplicated spans themselves: one row per maximal span,
    * `(doc_id, n_words, s0, e0)` with 1-based inclusive word positions.
    * Shared core of [[duplicateSpans]] (stats) and [[removeDupSpans]]
    * (cleaning); see duplicateSpans for the shuffle profile.
    */
  private[graft] def mergedDupSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      w: Int
  ): DataFrame = {
    require(w >= 2, s"window width must be >= 2, got $w")
    // positional window hashes come from ONE native pass per document
    // (functions.Sketches.gramXxHashesAll — the string-building HOF
    // form ran interpreted and cost ~3x); posexplode recovers the
    // 1-based window start
    val wins = docs
      .select(col(idCol).as("doc_id"),
        size(split(trim(col(textCol)), "\\s+")).as("n_words"),
        posexplode(graft.functions.Sketches.gramXxHashesAllCol(col(textCol), w)))
      .select(col("doc_id"), col("n_words"),
        (col("pos") + 1).as("pos"), col("col").as("h"))
    // the duplicated-key table is usually tiny (bounded by distinct
    // repeated windows, not corpus size), but its STATIC size estimate
    // derives from the corpus-sized child, so the planner would pick a
    // sort-merge semi join — shuffling the full window frame — and AQE
    // cannot cancel that shuffle write once it has started (measured
    // at sf10: 31 s vs 7 s, all of it the ~1 GB wide shuffle). The
    // checkpoint materializes dup so planning sees its REAL size:
    // small → broadcast semi join, the wide side never shuffles;
    // genuinely large (duplicate-saturated corpus) → the sort-merge
    // plan is the right one anyway.
    val dup = wins.groupBy("h").agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .select("h").localCheckpoint()
    val marked = wins.join(dup, Seq("h"), "left_semi")
    val prevRows = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val runRows = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // new island when this window starts past the farthest end seen so
    // far; ends are pos + w - 1 and pos is the sort key, so the running
    // max end is max(pos) over the preceding rows + w - 1
    val flagged = marked
      .withColumn("new_span",
        when(col("pos") > coalesce(max(col("pos")).over(prevRows), lit(-1000000)) + (w - 1),
          lit(1)).otherwise(lit(0)))
      .withColumn("island", sum(col("new_span")).over(runRows))
    flagged
      .groupBy("doc_id", "n_words", "island")
      .agg(min(col("pos")).as("s0"), (max(col("pos")) + (w - 1)).as("e0"))
      .select("doc_id", "n_words", "s0", "e0")
  }

  /** Duplicate-span REMOVAL — the actionable form of
    * [[duplicateSpans]]: cut every merged duplicated span out of the
    * document and re-emit the surviving words (whitespace-normalized,
    * single-space joined — both engines reconstruct from the same
    * token array). Documents without duplicated spans pass through
    * with their full (normalized) text.
    *
    * Scale shape: the span table is tiny (flagged docs only) and joins
    * back on doc_id; the cut itself is a per-row lambda over the
    * document's own word array (work linear in document length — the
    * same per-row cost as tokenization), so no word-level explode or
    * shuffle happens.
    */
  def removeDupSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      w: Int
  ): DataFrame = {
    val spans = mergedDupSpans(docs, idCol, textCol, w)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("s0"), col("e0"))).as("spans"))
    val words = split(trim(col(textCol)), "\\s+")
    docs
      .select(col(idCol).as("doc_id"), words.as("w"))
      .withColumn("n_words", size(col("w")))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("spans",
        coalesce(col("spans"), array().cast("array<struct<s0:int,e0:int>>")))
      // keep word i (1-based) unless some span covers it
      .withColumn("kept", filter(col("w"),
        (x, i) => !exists(col("spans"),
          s => (i + 1) >= s.getField("s0") && (i + 1) <= s.getField("e0"))))
      .select(col("doc_id"), col("n_words"),
        size(col("kept")).as("kept_words"),
        array_join(col("kept"), " ").as("cleaned_text"))
  }

  def simHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val sk = df
      .select(col(idCol).as("id"), simHash64(col(textCol)).as("s"))
      .localCheckpoint() // consumed by the band explode AND both verify lookups
    val banded = sk.select(
      col("id"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band_idx"),
          (shiftright(col("s"), 16 * b).bitwiseAND(lit(0xffffL))).as("band_key"))
      }: _*)).as("band"))
      .select(col("id"), col("band.band_idx"), col("band.band_key"))
    val cand = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(sk.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(sk.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("s_a").bitwiseXOR(col("s_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Two-level SimHash near-dup: collapse identical sketches into
    * CLASSES first (`group by s` → representative = min id, size m),
    * then run the Manku banded join over the DISTINCT sketches only.
    * Emits one row per near-dup class pair — a self row (rep, rep,
    * hamming 0, m·(m−1)/2 implied doc pairs) for every class of ≥2,
    * and a cross row (rep_a, rep_b, hamming, m_a·m_b) for every
    * distinct-sketch pair within `maxHamming`. The sum of
    * `implied_pairs` equals [[simHashPairs]]'s row count EXACTLY
    * (every doc pair lands in exactly one class pair), so the
    * collapsed form loses nothing — it just refuses to materialize
    * duplicate-multiplicity² rows.
    *
    * This is the shape that survives duplicate-heavy corpora: the
    * banded join is quadratic in per-bucket DISTINCT sketches, not in
    * documents, so a million bit-identical copies cost one groupBy
    * row instead of 5·10¹¹ candidate pairs. [[simHashPairs]] stays
    * the doc-level form for oracle parity and corpora where sketches
    * rarely repeat.
    */
  def simHashClassPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val cls = df
      .select(col(idCol).as("id"), simHash64(col(textCol)).as("s"))
      .groupBy("s")
      .agg(min("id").as("rep"), count(lit(1)).as("m"))
      .localCheckpoint() // consumed by the band explode, both verify lookups, and self rows
    val banded = cls.select(
      col("s"), col("rep"), col("m"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band_idx"),
          (shiftright(col("s"), 16 * b).bitwiseAND(lit(0xffffL))).as("band_key"))
      }: _*)).as("band"))
      .select(col("s"), col("rep"), col("m"), col("band.band_idx"), col("band.band_key"))
    val cross = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.rep") < col("b.rep"))
      .select(col("a.rep").as("rep_a"), col("b.rep").as("rep_b"),
        col("a.s").as("s_a"), col("b.s").as("s_b"),
        col("a.m").as("size_a"), col("b.m").as("size_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("s_a").bitwiseXOR(col("s_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("rep_a"), col("rep_b"), col("hamming"),
        col("size_a"), col("size_b"),
        (col("size_a") * col("size_b")).as("implied_pairs"))
    val self = cls.filter(col("m") >= 2)
      .select(col("rep").as("rep_a"), col("rep").as("rep_b"),
        lit(0).as("hamming"), col("m").as("size_a"), col("m").as("size_b"),
        expr("CAST(m * (m - 1) DIV 2 AS BIGINT)").as("implied_pairs"))
    cross.unionByName(self)
  }

  /** Quality-aware canonical selection: cluster documents by the md5
    * of their first `prefixWords` NORMALIZED words — the same-opening
    * fingerprint that catches truncation variants exact hashing
    * misses (one copy cut short still shares the prefix) — and keep
    * the copy with the MOST TOKENS (ties: lowest id), the
    * "keep the longest variant" policy real cleaning pipelines use
    * instead of min-id. Emits one row per group of ≥2.
    *
    * Shape: the shuffle carries (fp, id, n_toks) — never the
    * document; rank and group-size share one window partitioning
    * (a single exchange). Quality is an integer token count: the
    * argmax is exactly reproducible with no FP concerns.
    */
  /** The exact-dup cluster key shared by [[canonicalByQuality]] and
    * [[sourceDupProfile]]: md5 over the first `prefixWords`
    * normalized words. One definition so the dd14/dd15 cross-query
    * equivalence is structural, not coincidental.
    */
  private def prefixFingerprint(textCol: String, prefixWords: Int): Column = {
    val norm = TextAnalysis.normalizeForDedup(col(textCol))
    md5(array_join(slice(split(norm, " "), 1, prefixWords), " "))
  }

  def canonicalByQuality(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      prefixWords: Int = 8
  ): DataFrame = {
    val base = docs.select(
      col(idCol),
      prefixFingerprint(textCol, prefixWords).as("norm_fp"),
      TextAnalysis.tokenCount(col(textCol)).as("n_toks"))
    val byFp = Window.partitionBy("norm_fp")
    val rank = byFp.orderBy(desc("n_toks"), col(idCol))
    base
      .withColumn("rn", row_number().over(rank))
      .withColumn("n_docs", count(lit(1)).over(byFp))
      .filter(col("rn") === 1 && col("n_docs") >= 2)
      .select(col("norm_fp"), col("n_docs").cast("int").as("n_docs"),
        col(idCol).as(s"kept_$idCol"), col("n_toks").as("kept_n_tokens"))
  }

  /** Per-source duplication diagnostics from the exact-dup fingerprint
    * ([[canonicalByQuality]]'s first-`prefixWords`-normalized-words
    * key): documents, clusters, surplus copies, dup fraction. Shape:
    * one map-side fingerprint pass, then a per-source
    * COUNT(DISTINCT fp) aggregation — partial aggregation runs
    * map-side and the final shuffle carries one row per source.
    */
  def sourceDupProfile(
      docs: DataFrame,
      textCol: String,
      sourceCol: String,
      prefixWords: Int = 8
  ): DataFrame = {
    docs
      .select(col(sourceCol).as("source"),
        prefixFingerprint(textCol, prefixWords).as("fp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_clusters"))
      .select(col("source"), col("n_docs"), col("n_clusters"),
        (col("n_docs") - col("n_clusters")).as("n_dup_docs"),
        ((col("n_docs") - col("n_clusters")).cast("double") / col("n_docs")).as("dup_frac"))
  }
}
