package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash over a string's UTF-8 bytes —
  * `h = h * 1000003 + byte` (the classic Karp–Rabin form) — used as a
  * cheap document fingerprint for dedup prefiltering.
  *
  * Implemented as a native Catalyst `Expression` WITH codegen (not a
  * Scala UDF): the generated loop runs inside whole-stage codegen, so
  * fingerprinting a 100 TB corpus stays in one fused stage with no
  * serialization boundary.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash64 needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 1469598103934665603L // FNV offset basis as seed
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 1469598103934665603L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 1000003L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

/** rolling_hash64 finished with the murmur3 fmix64 avalanche — use
  * when DOWNSTREAM consumes bit positions directly (HLL leading-zero
  * ranks, bit sampling): the raw polynomial fold leaves the high bits
  * of short inputs nearly constant, which biases position-sensitive
  * sketches. The finalizer stays SQL-reproducible (xor + 32-bit-limb
  * multiply mod 2^64 in HUGEINT).
  */
case class MixedHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mixed_hash64 needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 1469598103934665603L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xffL)
      i += 1
    }
    MixedHash64.fmix64(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 1469598103934665603L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 1000003L + ($bytes[$i] & 0xffL);
         |}
         |$h ^= ($h >>> 33); $h *= 0xff51afd7ed558ccdL;
         |$h ^= ($h >>> 33); $h *= 0xc4ceb9fe1a85ec53L;
         |$h ^= ($h >>> 33);
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MixedHash64 =
    copy(child = newChild)
}

object MixedHash64 {
  val name = "mixed_hash64"

  def fmix64(h0: Long): Long = {
    var h = h0
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!registry.functionExists(ident))
      registry.createOrReplaceTempFunction(
        name,
        exprs => {
          require(exprs.length == 1, s"$name expects exactly 1 argument, got ${exprs.length}")
          MixedHash64(exprs.head)
        },
        "built-in"
      )
  }

  def apply(c: Column): Column = call_function(name, c)
}

object RollingHash64 {
  val name = "rolling_hash64"

  /** Register in the session's function registry (Spark 4's Column no
    * longer wraps Expression directly, so custom expressions are
    * exposed through the registry + `call_function`). Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!registry.functionExists(ident))
      registry.createOrReplaceTempFunction(
        name,
        exprs => {
          require(exprs.length == 1, s"$name expects exactly 1 argument, got ${exprs.length}")
          RollingHash64(exprs.head)
        },
        "built-in"
      )
  }

  /** Column-level entry point (requires [[register]] on the session). */
  def apply(c: Column): Column = call_function(name, c)
}
