package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) code: interleaves the bits of two 32-bit keys into
  * one 64-bit sort key, so sorting by it clusters rows that are close
  * in BOTH dimensions. Files written in this order get tight per-file
  * min/max ranges on both columns → parquet row-group/file skipping
  * works for predicates on either column (the poor-man's secondary
  * index of SURVEY.md §4).
  *
  * Native codegen'd Catalyst expression; the classic
  * magic-number bit spreading runs branch-free inside whole-stage
  * codegen.
  */
case class InterleaveBits(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"interleave_bits needs (int, int), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(l: Any, r: Any): Any =
    InterleaveBits.morton(l.asInstanceOf[Int], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.InterleaveBits.morton($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  val name = "interleave_bits"

  /** Spread the low 32 bits of x into the even bit positions. */
  private def spread(x0: Int): Long = {
    var x = x0.toLong & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8))  & 0x00ff00ff00ff00ffL
    x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /** 64-bit Morton code of two ints (called from generated code). */
  def morton(a: Int, b: Int): Long = spread(a) | (spread(b) << 1)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => {
        require(exprs.length == 2, s"$name expects exactly 2 arguments, got ${exprs.length}")
        InterleaveBits(exprs.head, exprs(1))
      },
      "built-in")

  def apply(a: Column, b: Column): Column = call_function(name, a, b)
}
