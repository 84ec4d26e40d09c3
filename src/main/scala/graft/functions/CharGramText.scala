package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined character n-grams of a string, in ONE pass per row
  * (SURVEY §2.4 X5; the re-texting step of
  * [[graft.operators.TextAnalysis.withCharGrams]]).
  *
  * Semantics are EXACTLY the composable HOF pipeline it replaces (and
  * the DuckDB oracle replays): output =
  * `array_join(transform(sequence(1, len−n+1), i -> substr(s, i, n)),
  * " ")`, with fewer than `n` characters → `""`. Code-point-based
  * positions (the [[WinnowWins]] convention — Spark's and DuckDB's
  * `substr`/`length` both count code points, so supplementary-plane
  * characters occupy ONE position).
  *
  * Why native: the HOF form runs one interpreted `substr` lambda per
  * character position — on char-trigram language-ID over sf0.1 the
  * q130 catalog entry spent ~19 s, dominated by millions of
  * per-position lambda invocations across the three training scans.
  * Here it is one code-point array + one StringBuilder pass per row;
  * `CodegenFallback` costs one interpreted call per ROW, irrelevant
  * next to the per-row work. */
case class CharGramText(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n > 0, s"n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_gram_text requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val len = cps.length
    if (len < n) return UTF8String.fromString("")
    val nGrams = len - n + 1
    val sb = new java.lang.StringBuilder(nGrams * (n + 1))
    var i = 0
    while (i < nGrams) {
      if (i > 0) sb.append(' ')
      sb.appendCodePoint(cps(i))
      var j = 1
      while (j < n) { sb.appendCodePoint(cps(i + j)); j += 1 }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGramText {
  /** Column-API entry point. */
  def charGramText(text: Column, n: Int): Column =
    ColumnBridge.column(CharGramText(ColumnBridge.expression(text), n))
}
