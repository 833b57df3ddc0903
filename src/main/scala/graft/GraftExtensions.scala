package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.RollingHash64

/** Session extensions — the `SparkSessionExtensions` registration
  * path, so pure-SQL users get the engine's custom expressions
  * without touching the Scala API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * // then: spark.sql("SELECT rolling_hash64(text) FROM docs")
  * }}}
  *
  * Per SURVEY.md §7.3, no custom optimizer Rule or SparkStrategy is
  * required for reference parity (Catalyst's built-ins cover the
  * plan shapes), so this intentionally registers functions only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        new FunctionIdentifier(RollingHash64.name),
        new ExpressionInfo(
          classOf[RollingHash64].getCanonicalName,
          null,
          RollingHash64.name,
          "_FUNC_(str) - 64-bit polynomial rolling hash of str's UTF-8 bytes.",
          ""
        ),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          require(exprs.length == 1,
            s"rolling_hash64 expects exactly 1 argument, got ${exprs.length}")
          RollingHash64(exprs.head)
        }
      )
    )
  }
}
