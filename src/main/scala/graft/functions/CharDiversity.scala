package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-distribution diversity of a string, one pass, map-only —
  * a repetition/gibberish quality signal (low diversity = filler spam,
  * high top-char ratio = padding) for LLM-corpus quality gates.
  *
  * Returns `array<double>` of
  * `[simpson, n_distinct, top_ratio]` where, over the string's Unicode
  * code points with counts `c_i` and total `n`:
  *  - `simpson   = 1.0 − Σ (c_i/n)²` (Simpson diversity index),
  *  - `n_distinct` = number of distinct code points,
  *  - `top_ratio` = max c_i / n;
  * an empty string yields `[0.0, 0.0, 0.0]`.
  *
  * Arithmetic is RATIONAL on purpose (no entropy log): the per-term
  * squares fold in ASCENDING CODE POINT order from 0.0, so the value
  * is bit-reproducible and exactly replayable in DuckDB with
  * `list(... ORDER BY cp)` + `list_reduce` — the same no-transcendental
  * policy as the BM25/idf oracles (cross-engine `ln` parity is not a
  * portable assumption).
  *
  * Codegen note: the generated code is a single static call into
  * [[CharDiversity.compute]] — the row stays inside whole-stage
  * codegen with no Scala-UDF serialization boundary; the per-string
  * loop is JIT-compiled JVM code either way.
  */
case class CharDiversityExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = CharDiversity.name

  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${CharDiversity.name} needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    CharDiversity.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.CharDiversity.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CharDiversityExpr =
    copy(child = newChild)
}

object CharDiversity {
  val name = "char_diversity"

  /** One pass + an ordered fold over the (sorted) code-point counts. */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    if (str.isEmpty) return new GenericArrayData(Array(0.0, 0.0, 0.0))
    val counts = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
      n += 1L
      i += Character.charCount(cp)
    }
    val nd = counts.size.toDouble
    var sq = 0.0 // ascending code point: TreeMap iteration order
    var mx = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      val p = c.toDouble / n
      sq += p * p
      if (c > mx) mx = c
    }
    new GenericArrayData(Array(1.0 - sq, nd, mx.toDouble / n))
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!registry.functionExists(ident))
      registry.createOrReplaceTempFunction(
        name,
        exprs => {
          require(exprs.length == 1, s"$name expects exactly 1 argument, got ${exprs.length}")
          CharDiversityExpr(exprs.head)
        },
        "built-in"
      )
  }

  def apply(c: Column): Column = call_function(name, c)
}
