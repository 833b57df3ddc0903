package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass language-ID kernel — replaces |languages| regex scans
  * (one `regexp_count(lower(text), '\bm1\b|…')` per language) with
  * ONE scan over the lowered text.
  *
  * Exactness contract (spec-checked against the declarative form):
  * for the marker shapes `operators.TextAnalysis.langMarkers` uses —
  * pure-ASCII `\w` words (anchored `\b…\b`) and non-ASCII single-char
  * substrings, all markers distinct across languages — the regex
  * count decomposes per position, so:
  *  - a `\b`-anchored ASCII word matches exactly where a MAXIMAL
  *    word-char run equals the marker. Java's `\b` is Unicode-aware
  *    even without UNICODE_CHARACTER_CLASS (its word class is `_` ∪
  *    `Character.isLetterOrDigit`), so runs segment on that class —
  *    `\bthe\b` does NOT match inside "theé";
  *  - a single-char CJK marker's non-overlapping count is its char
  *    count, counted everywhere (CJK ideographs are letters, i.e.
  *    INSIDE word runs).
  * Lowercasing uses `UTF8String.toLowerCase` — the same call Spark's
  * `lower()` performs. Tiebreak and the 'und' floor mirror
  * `TextAnalysis.langId`: max score wins, ascending language code on
  * ties, 'und' when all scores are 0.
  */
object LangIdKernel {

  case class LangIdExpr(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def checkInputDataTypes() =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lang_id needs a string argument, got ${child.dataType}")

    private lazy val langs: Array[String] =
      graft.operators.TextAnalysis.langMarkers.keys.toArray.sorted
    private lazy val (wordToLang, charToLang, maxWordLen) = {
      val markers = langs.zipWithIndex.flatMap { case (l, i) =>
        graft.operators.TextAnalysis.langMarkers(l).map(_ -> i)
      }
      require(markers.map(_._1).distinct.length == markers.length,
        "lang markers must be distinct across languages")
      val (ascii, cjk) = markers.partition(_._1.forall(_ < 128))
      require(cjk.forall(_._1.length == 1), "non-ASCII markers must be single chars")
      require(ascii.forall(_._1.forall(c => isWordChar(c))), "ASCII markers must be \\w words")
      (ascii.toMap, cjk.map { case (w, i) => w.charAt(0) -> i }.toMap,
        if (ascii.isEmpty) 0 else ascii.map(_._1.length).max)
    }
    private def isWordChar(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'
    // Java \b's word class (Pattern.Bound without UNICODE_CHARACTER_CLASS)
    private def isBoundWord(cp: Int): Boolean =
      cp == '_' || Character.isLetterOrDigit(cp)

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toLowerCase.toString
      val scores = new Array[Int](langs.length)
      var i = 0
      val n = s.length
      while (i < n) {
        val cp = s.codePointAt(i)
        if (isBoundWord(cp)) {
          // maximal \b-word run; ASCII markers must equal the WHOLE
          // run, CJK marker chars count anywhere inside it
          var j = i
          while (j < n && isBoundWord(s.codePointAt(j))) j += Character.charCount(s.codePointAt(j))
          var k = i
          while (k < j) {
            val c = s.charAt(k)
            if (c >= 128) charToLang.get(c).foreach(scores(_) += 1)
            k += 1
          }
          if (j - i <= maxWordLen) {
            wordToLang.get(s.substring(i, j)) match {
              case Some(li) => scores(li) += 1
              case None =>
            }
          }
          i = j
        } else {
          if (cp < 0x10000) charToLang.get(cp.toChar).foreach(scores(_) += 1)
          i += Character.charCount(cp)
        }
      }
      var best = -1
      var bestScore = 0
      var li = 0
      while (li < langs.length) {
        if (scores(li) > bestScore) { best = li; bestScore = scores(li) }
        li += 1
      }
      UTF8String.fromString(if (best < 0) "und" else langs(best))
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier("lang_id")
    if (!registry.functionExists(ident))
      registry.createOrReplaceTempFunction("lang_id", es => LangIdExpr(es(0)), "built-in")
  }

  def apply(text: Column): Column = {
    register(SparkSession.active)
    call_function("lang_id", text)
  }
}
