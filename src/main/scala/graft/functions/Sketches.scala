package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row kernels for the dedup sketches (MinHash signature,
  * SimHash, winnowing, gram hashing).
  *
  * Why expressions and not the higher-order-function encodings they
  * replace: HOF lambdas run interpreted (outside whole-stage codegen)
  * and re-allocate an UTF8String per array element per pass, so a
  * shingle→hash→fold pipeline costs ~1 ms/doc. Each kernel here is one
  * tight Java loop over the document — the per-row cost that actually
  * survives a 100 TB scan. `CodegenFallback` is fine: the work is
  * chunky per row, so the single virtual call per row is noise.
  *
  * Every kernel is BIT-IDENTICAL to the declarative form it replaced
  * (the DuckDB oracles pin the semantics):
  *  - tokenization = `split(trim(text), "\\s+")`: trim strips ' '
  *    only (UTF8String.trim), split keeps trailing empties (limit -1);
  *  - gram hash = rolling_hash64 over the gram's UTF-8 bytes (words
  *    joined with ' ');
  *  - MinHash = min over grams of (a_i*h + b_i) mod (2^31-1) — min
  *    over duplicates equals min over the distinct set, so no dedup
  *    pass is needed;
  *  - SimHash = ±1 votes per bit of each token hash, sign → bit;
  *  - winnowing = min hash in each window of w consecutive grams
  *    (single global min when fewer than w grams), first-occurrence
  *    distinct — MOSS semantics.
  */
object Sketches {
  private val Ws = Pattern.compile("\\s+")
  val Seed = 1469598103934665603L // FNV offset basis, same as RollingHash64
  val MersennePrime: Long = (1L << 31) - 1

  /** Exactly `split(trim(text), "\\s+")`: UTF8String.trim strips ' '
    * only (like Spark's trim), split keeps trailing empties
    * (limit -1, like Spark's 2-arg split). Public: FunctionsSpec
    * property-checks this identity against the Spark expression.
    */
  def tokens(input: UTF8String): Array[String] =
    Ws.split(input.trim().toString, -1)

  /** rolling_hash64 of words(from)..words(from+k-1) joined with ' ',
    * computed without materializing the gram string. Callers pass
    * pre-converted word bytes (each word participates in up to k
    * grams — converting once per word, not per gram, matters in the
    * scan loop).
    */
  private def gramRollingHash(words: Array[Array[Byte]], from: Int, k: Int): Long = {
    var h = Seed
    var wi = 0
    while (wi < k) {
      if (wi > 0) h = h * 1000003L + ' '.toLong
      val bytes = words(from + wi)
      var i = 0
      while (i < bytes.length) {
        h = h * 1000003L + (bytes(i) & 0xffL)
        i += 1
      }
      wi += 1
    }
    h
  }

  private def toBytes(words: Array[String]): Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](words.length)
    var i = 0
    while (i < words.length) {
      out(i) = words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    out
  }

  /** MinHash signature: array<long> of `numHashes` minima, empty when
    * the document has no k-grams.
    */
  def minHashSig(words: Array[String], k: Int, a: Array[Long], b: Array[Long]): Array[Long] = {
    val m = words.length - k + 1
    if (m <= 0) return Array.emptyLongArray
    val wb = toBytes(words)
    val n = a.length
    val sig = Array.fill(n)(MersennePrime)
    var g = 0
    while (g < m) {
      val raw = gramRollingHash(wb, g, k)
      val h = ((raw % MersennePrime) + MersennePrime) % MersennePrime
      var i = 0
      while (i < n) {
        val v = (a(i) * h + b(i)) % MersennePrime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      g += 1
    }
    sig
  }

  def simHash(words: Array[String]): Long = {
    val votes = new Array[Int](64)
    var t = 0
    while (t < words.length) {
      val bytes = words(t).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var h = Seed
      var i = 0
      while (i < bytes.length) {
        h = h * 1000003L + (bytes(i) & 0xffL)
        i += 1
      }
      var b = 0
      while (b < 64) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def winnow(words: Array[String], k: Int, w: Int): Array[Long] = {
    val m = words.length - k + 1
    if (m <= 0) return Array.emptyLongArray
    val wb = toBytes(words)
    val hs = new Array[Long](m)
    var g = 0
    while (g < m) { hs(g) = gramRollingHash(wb, g, k); g += 1 }
    val out = new java.util.LinkedHashSet[Long]()
    if (m < w) {
      var mn = hs(0); var i = 1
      while (i < m) { if (hs(i) < mn) mn = hs(i); i += 1 }
      out.add(mn)
    } else {
      var i = 0
      while (i <= m - w) {
        var mn = hs(i); var j = i + 1
        while (j < i + w) { if (hs(j) < mn) mn = hs(j); j += 1 }
        out.add(mn)
        i += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator(); var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    arr
  }

  /** Second Bloom hash derivation constant (golden-ratio odd word):
    * h2 = fmix64(rawGramHash ^ BloomTweak) — one xor instead of a
    * second byte pass, still SQL-reproducible (HUGEINT xor).
    */
  val BloomTweak = 0x9e3779b97f4a7c15L

  /** Distinct Bloom bit positions over a document's distinct word
    * k-grams: per gram, `numHashes` double-hashed positions
    * pos_i = (h1 + i·h2) & (mBits-1)  (Kirsch–Mitzenmacher scheme).
    * `mBits` must be a power of two so Java's wrapping add/multiply
    * agrees with exact mod-2^64 arithmetic on the low bits (the
    * DuckDB oracle replays this in HUGEINT).
    */
  def bloomPositions(words: Array[String], k: Int, numHashes: Int, mBits: Int): Array[Long] = {
    require(Integer.bitCount(mBits) == 1, s"mBits must be a power of two, got $mBits")
    val m = words.length - k + 1
    if (m <= 0) return Array.emptyLongArray
    val wb = toBytes(words)
    val seen = new java.util.HashSet[Long]()
    val out = new java.util.LinkedHashSet[Long]()
    val mask = (mBits - 1).toLong
    var g = 0
    while (g < m) {
      val raw = gramRollingHash(wb, g, k)
      if (seen.add(raw)) {
        val h1 = MixedHash64.fmix64(raw)
        val h2 = MixedHash64.fmix64(raw ^ BloomTweak)
        var i = 0
        while (i < numHashes) {
          out.add((h1 + i * h2) & mask)
          i += 1
        }
      }
      g += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator(); var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    arr
  }

  /** Probe a packed Bloom filter (little-endian 64-bit words) with a
    * document's distinct k-grams: returns (nGrams, nMaybe) where
    * nMaybe counts grams whose `numHashes` bits are ALL set —
    * includes the filter's deterministic false positives, which the
    * oracle replays exactly.
    */
  def bloomProbe(
      words: Array[String], k: Int, numHashes: Int, mBits: Int,
      filter: Array[Long]): (Long, Long) = {
    val m = words.length - k + 1
    if (m <= 0) return (0L, 0L)
    val wb = toBytes(words)
    val seen = new java.util.HashSet[Long]()
    val mask = (mBits - 1).toLong
    var nMaybe = 0L
    var g = 0
    while (g < m) {
      val raw = gramRollingHash(wb, g, k)
      if (seen.add(raw)) {
        val h1 = MixedHash64.fmix64(raw)
        val h2 = MixedHash64.fmix64(raw ^ BloomTweak)
        var all = true
        var i = 0
        while (all && i < numHashes) {
          val pos = (h1 + i * h2) & mask
          all = (filter((pos >>> 6).toInt) & (1L << (pos & 63).toInt)) != 0
          i += 1
        }
        if (all) nMaybe += 1
      }
      g += 1
    }
    (seen.size.toLong, nMaybe)
  }

  /** Distinct k-gram xxhash64 values (Spark's seed-42 xxhash64 of the
    * gram string — identical to `xxhash64(explode(wordShingles(...)))`
    * so join keys match the declarative jaccard form).
    */
  def gramXxHashes(words: Array[String], k: Int): Array[Long] = {
    val m = words.length - k + 1
    if (m <= 0) return Array.emptyLongArray
    val out = new java.util.LinkedHashSet[Long]()
    val sb = new java.lang.StringBuilder()
    var g = 0
    while (g < m) {
      sb.setLength(0)
      var wi = 0
      while (wi < k) {
        if (wi > 0) sb.append(' ')
        sb.append(words(g + wi))
        wi += 1
      }
      out.add(
        XxHash64Function.hash(UTF8String.fromString(sb.toString), StringType, 42L))
      g += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator(); var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    arr
  }

  /** ALL k-gram xxhash64 values in document order, duplicates kept:
    * out(g) = hash of the gram starting at word g (0-based) — the
    * positional form span-level dedup needs (`posexplode` recovers
    * the position). Same per-gram hash as [[gramXxHashes]], i.e.
    * `xxhash64(array_join(slice(words, g+1, k), ' '))`.
    */
  def gramXxHashesAll(words: Array[String], k: Int): Array[Long] = {
    val m = words.length - k + 1
    if (m <= 0) return Array.emptyLongArray
    val out = new Array[Long](m)
    val sb = new java.lang.StringBuilder()
    var g = 0
    while (g < m) {
      sb.setLength(0)
      var wi = 0
      while (wi < k) {
        if (wi > 0) sb.append(' ')
        sb.append(words(g + wi))
        wi += 1
      }
      out(g) = XxHash64Function.hash(UTF8String.fromString(sb.toString), StringType, 42L)
      g += 1
    }
    out
  }

  // ── expression wrappers ───────────────────────────────────────────
  abstract class SketchExpr extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes() =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs a string argument, got ${child.dataType}")
  }

  case class MinHashSigExpr(child: Expression, k: Int, numHashes: Int) extends SketchExpr {
    private lazy val (pa, pb) = {
      val ps = graft.operators.Dedup.hashParams(numHashes)
      (ps.map(_._1).toArray, ps.map(_._2).toArray)
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(minHashSig(tokens(input.asInstanceOf[UTF8String]), k, pa, pb))
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  case class SimHash64Expr(child: Expression) extends SketchExpr {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      simHash(tokens(input.asInstanceOf[UTF8String]))
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  case class WinnowExpr(child: Expression, k: Int, w: Int) extends SketchExpr {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(winnow(tokens(input.asInstanceOf[UTF8String]), k, w))
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  case class GramXxHashesExpr(child: Expression, k: Int) extends SketchExpr {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(gramXxHashes(tokens(input.asInstanceOf[UTF8String]), k))
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  case class GramXxHashesAllExpr(child: Expression, k: Int) extends SketchExpr {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(gramXxHashesAll(tokens(input.asInstanceOf[UTF8String]), k))
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** 63-bit average-hash (aHash) over a media payload: sample 63
    * evenly-spaced bytes as "pixels", set bit j when pixel j is above
    * the sample mean (compared in integers: p·63 > Σp — no float
    * mean). 63 bits, not 64, keeps the hash positive in both engines'
    * signed BIGINT. On a real image the bytes would be the 8×8
    * grayscale downscale; the sampling stands in for the stub codec.
    */
  case class PHash63Expr(child: Expression) extends SketchExpr {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      pHash63(input.asInstanceOf[UTF8String].getBytes)
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def pHash63(b: Array[Byte]): Long = {
    val nb = b.length
    if (nb == 0) return 0L
    val px = new Array[Int](63)
    var s = 0; var j = 0
    while (j < 63) { px(j) = b((j * nb) / 63) & 0xff; s += px(j); j += 1 }
    var h = 0L; j = 0
    while (j < 63) { if (px(j) * 63 > s) h |= 1L << j; j += 1 }
    h
  }

  case class BloomPositionsExpr(child: Expression, k: Int, numHashes: Int, mBits: Int)
      extends SketchExpr {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(
        bloomPositions(tokens(input.asInstanceOf[UTF8String]), k, numHashes, mBits))
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Probe expression: the filter argument must be FOLDABLE (a literal
    * array built by `operators.Bloom.buildFilter`) — it is unpacked to
    * a primitive long[] once, not per row, so the probe loop stays a
    * bit-test against a flat array.
    */
  case class BloomProbeExpr(
      text: Expression, filterExpr: Expression, k: Int, numHashes: Int, mBits: Int)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
    override def left: Expression = text
    override def right: Expression = filterExpr
    override def dataType: DataType = org.apache.spark.sql.types.StructType(
      Seq(
        org.apache.spark.sql.types.StructField("n_grams", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_maybe", LongType, nullable = false)))
    override def checkInputDataTypes() =
      // element type pinned to non-null bigint: a foldable array<int>
      // would pass a bare ArrayType check and then ClassCastException
      // inside toLongArray() at execution — fail at analysis instead
      if (text.dataType == StringType && filterExpr.foldable &&
          filterExpr.dataType == ArrayType(LongType, containsNull = false))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "bloom_probe needs (string, foldable array<bigint> filter with non-null elements)")
    private lazy val filterWords: Array[Long] =
      filterExpr.eval().asInstanceOf[ArrayData].toLongArray()
    override def nullSafeEval(t: Any, f: Any): Any = {
      val (nGrams, nMaybe) =
        bloomProbe(tokens(t.asInstanceOf[UTF8String]), k, numHashes, mBits, filterWords)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](nGrams, nMaybe))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(text = l, filterExpr = r)
  }

  // ── registry plumbing (Spark 4: custom expressions reach Column
  // land through the function registry + call_function) ─────────────
  private def registerIfAbsent(
      spark: SparkSession, name: String, builder: Seq[Expression] => Expression): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier(name)))
      registry.createOrReplaceTempFunction(name, builder, "built-in")
  }

  // accept any foldable int-ish expression (2+1, BIGINT literals, …),
  // not just Literal(Int) — SQL callers fold constants lazily
  private def intArg(e: Expression, what: String): Int =
    if (e.foldable) e.eval() match {
      case v: Int => v
      case v: Long if v >= Int.MinValue && v <= Int.MaxValue => v.toInt
      case v: Short => v.toInt
      case v: Byte => v.toInt
      case other =>
        throw new IllegalArgumentException(s"$what must be an integer constant, got $other")
    } else throw new IllegalArgumentException(s"$what must be a constant expression, got $e")

  def register(spark: SparkSession): Unit = {
    registerIfAbsent(spark, "minhash_sig",
      es => MinHashSigExpr(es(0), intArg(es(1), "k"), intArg(es(2), "numHashes")))
    registerIfAbsent(spark, "simhash64", es => SimHash64Expr(es(0)))
    registerIfAbsent(spark, "winnow_fp",
      es => WinnowExpr(es(0), intArg(es(1), "k"), intArg(es(2), "w")))
    registerIfAbsent(spark, "gram_xxhashes",
      es => GramXxHashesExpr(es(0), intArg(es(1), "k")))
    registerIfAbsent(spark, "gram_xxhashes_all",
      es => GramXxHashesAllExpr(es(0), intArg(es(1), "k")))
    registerIfAbsent(spark, "bloom_positions",
      es => BloomPositionsExpr(es(0), intArg(es(1), "k"), intArg(es(2), "numHashes"),
        intArg(es(3), "mBits")))
    registerIfAbsent(spark, "bloom_probe",
      es => BloomProbeExpr(es(0), es(1), intArg(es(2), "k"), intArg(es(3), "numHashes"),
        intArg(es(4), "mBits")))
    registerIfAbsent(spark, "phash63", es => PHash63Expr(es(0)))
  }

  private def active: SparkSession = SparkSession.active

  def pHash63Col(payload: Column): Column = {
    register(active)
    call_function("phash63", payload)
  }

  def minHashSigCol(text: Column, k: Int, numHashes: Int): Column = {
    register(active)
    call_function("minhash_sig", text, org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(numHashes))
  }
  def simHash64Col(text: Column): Column = {
    register(active)
    call_function("simhash64", text)
  }
  def winnowCol(text: Column, k: Int, w: Int): Column = {
    register(active)
    call_function("winnow_fp", text, org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(w))
  }
  def gramXxHashesCol(text: Column, k: Int): Column = {
    register(active)
    call_function("gram_xxhashes", text, org.apache.spark.sql.functions.lit(k))
  }
  def gramXxHashesAllCol(text: Column, k: Int): Column = {
    register(active)
    call_function("gram_xxhashes_all", text, org.apache.spark.sql.functions.lit(k))
  }
  def bloomPositionsCol(text: Column, k: Int, numHashes: Int, mBits: Int): Column = {
    register(active)
    call_function("bloom_positions", text, org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(numHashes), org.apache.spark.sql.functions.lit(mBits))
  }
  def bloomProbeCol(text: Column, filter: Column, k: Int, numHashes: Int, mBits: Int): Column = {
    register(active)
    call_function("bloom_probe", text, filter, org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(numHashes), org.apache.spark.sql.functions.lit(mBits))
  }
}
